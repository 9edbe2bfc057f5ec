package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{ExactNN, GraphSearch, KnnGraph}
import graft.ann.lsh.{Lsh, LshConfig}

/** Pruned vs full-scan graph SERVING at scale — the measurement behind
  * [[graft.ann.GraphSearch.beamFrom]]'s `pruneScanMax`: against STORED
  * tables (a [[GraphSearch.saveBucketed]] edge table and an id-bucketed
  * vector table), each walk hop can collect its driver-bounded frontier
  * and read only the frontier's buckets instead of scanning the corpus
  * per hop. Both modes serve the SAME query batch from the SAME stored
  * tables in one process, alternating, min-of-2 — plus the task-input
  * bytes per mode, which is the claim itself (reads scale with the
  * frontier, not the corpus).
  *
  * Usage: runMain graft.tools.BeamPruneProbe [n] [queries]
  * (default: 1000000 1000)
  */
object BeamPruneProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toInt else 1000000
    val qn = if (args.length > 1) args(1).toInt else 1000
    val k = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](f: => T): (T, Double) = ProbeGen.timed(f)
    val bytesAcc = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytesAcc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      })
    def settleBytes(): Long = {
      // bounded like the spec versions: a straggler task stream must not
      // hang the probe — return the last observed value after ~10 s
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100)
        val now = bytesAcc.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
        waited += 1
      }
      last
    }

    def gen(upTo: Long) = ProbeGen.clustered(spark, upTo)

    val corpus = gen(n).persist()
    corpus.count()
    GraphSearch.dropManagedTables(spark,
      "beam_probe_edges", "beam_probe_vecs")
    val (idx, tBuild) = timed {
      val ix = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
      val g = KnnGraph.fromLsh(ix, corpus, "vec_id", "embedding", 8,
          ExactNN.Cosine, maxBucketOccupancy = 50)
        .select(col("src"), col("dst"))
        .unionByName(GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst")
      GraphSearch.saveBucketed(g, "beam_probe")
      // the vector table, id-bucketed + sorted so an InSet on vec_id
      // prunes buckets AND row-groups
      corpus.write.mode("overwrite")
        .bucketBy(64, "vec_id").sortBy("vec_id")
        .saveAsTable("beam_probe_vecs")
      ix
    }
    println(f"[beam-prune] n=$n%,d stores built in $tBuild%.1fs")

    val storedG = GraphSearch.loadBucketed(spark, "beam_probe")
    val storedV = spark.table("beam_probe_vecs")
    val queries = corpus.where(col("vec_id") < qn)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val entries = idx.searchAll(queries, 32, Double.MaxValue,
        ExactNN.Cosine)
      .select(col("query_id"), col("vec_id").as("node"))
      .persist()
    entries.count()
    corpus.unpersist(false)

    def serve(prune: Int): (Double, Long) = {
      val b0 = { settleBytes(); bytesAcc.get() }
      val (_, t) = timed {
        GraphSearch.beamFrom(storedG, storedV, "vec_id", "embedding",
          queries, entries, k, 32, 4, ExactNN.Cosine,
          symmetrize = false, pruneScanMax = prune).count()
      }
      (t, settleBytes() - b0)
    }
    // alternate, two rounds each; min-of-2 wall + last round's bytes
    var (tOff, bOff) = serve(0)
    var (tOn, bOn) = serve(50000)
    val (tOff2, bOff2) = serve(0)
    val (tOn2, bOn2) = serve(50000)
    tOff = math.min(tOff, tOff2); bOff = bOff2
    tOn = math.min(tOn, tOn2); bOn = bOn2
    println(f"[beam-prune] serve $qn%,d queries, full-scan: $tOff%.1fs " +
      f"(${tOff / qn * 1000}%.1f ms/q), ${bOff / 1e6}%.0f MB read")
    println(f"[beam-prune] serve $qn%,d queries, pruned:    $tOn%.1fs " +
      f"(${tOn / qn * 1000}%.1f ms/q), ${bOn / 1e6}%.0f MB read")
    spark.stop()
  }
}
