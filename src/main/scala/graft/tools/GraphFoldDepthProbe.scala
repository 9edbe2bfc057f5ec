package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{ExactNN, GraphMaintainer, GraphSearch, KnnGraph}
import graft.ann.lsh.{Lsh, LshConfig}

/** Serve-latency-vs-unfolded-log-depth curve for the SCOPED graph
  * store — the measurement behind
  * [[graft.ann.GraphMaintainer.DefaultFoldEvery]] (the
  * LifecycleScaleProbe treatment applied to the one store whose logs
  * previously never auto-folded): stream insert+delete batches through
  * a scoped maintainer with the scheduled fold DISABLED, beam-serve a
  * fixed query set at increasing depths (batches since the last fold —
  * each batch adds an `edges_delta` fragment, every second batch a
  * scoped refine's supersede + replacement fragments), then run
  * [[graft.ann.GraphMaintainer.foldNow]] once and serve again: the
  * fold's own cost and the restored baseline bound what the cadence
  * buys.
  *
  * Usage: runMain graft.tools.GraphFoldDepthProbe [n] [depths...]
  * (default: 200000 4 8 16 32 64)
  */
object GraphFoldDepthProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toInt else 200000
    val depths =
      if (args.length > 1) args.tail.map(_.toInt).toSeq
      else Seq(4, 8, 16, 32, 64)
    val batchSize = 200
    val k = 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](f: => T): (T, Double) = ProbeGen.timed(f)
    def gen(upTo: Long) = ProbeGen.clustered(spark, upTo)

    val corpus = gen(n).persist()
    corpus.count()
    GraphSearch.dropManagedTables(spark,
      "fold_depth_edges", "fold_depth_swap_edges")
    val (_, tBuild) = timed {
      val idx = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
      val g = KnnGraph.fromLsh(idx, corpus, "vec_id", "embedding", k,
          ExactNN.Cosine, maxBucketOccupancy = 50)
        .select(col("src"), col("dst"))
        .unionByName(GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst")
      GraphSearch.saveBucketed(g, "fold_depth")
    }
    println(f"[fold-depth] n=$n%,d graph built in $tBuild%.1fs")

    // fold disabled (compactEvery > any depth probed): the curve IS the
    // un-compacted degradation the default cadence must sit under
    val m = new GraphMaintainer(spark, "fold_depth",
      java.nio.file.Files.createTempDirectory("fold_depth_lsm").toString,
      "vec_id", "embedding", k = k, beamWidth = 16, hops = 3,
      refineEvery = 2, maxReverseDegree = 2,
      scopedRefine = true, scopeHops = 1, compactEvery = 1000000)

    val queries = corpus.where(col("vec_id") % (n / 500) === 0)
      .limit(500)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val entries = queries.select(col("query_id"))
      .crossJoin(spark.range(32).select(col("id").as("node")))
      .persist()
    entries.count()

    def serveSec(all: org.apache.spark.sql.DataFrame): Double = {
      val excl = m.tombstones
      val e = if (excl.isEmpty) None else Some(excl)
      // min of 2: the first rep pays file listing, the second is the
      // steady-state serve the cadence is sized for
      (1 to 2).map { _ =>
        timed {
          GraphSearch.beamFrom(m.servingEdges, all, "vec_id", "embedding",
            queries, entries, k, 16, 3, ExactNN.Cosine,
            symmetrize = false, excluded = e).count()
        }._2
      }.min
    }

    println(f"[fold-depth] depth=0 serve ${serveSec(corpus)}%.2fs")
    var nextId = n.toLong
    var done = 0
    depths.foreach { d =>
      while (done < d) {
        val all = gen(nextId + batchSize)
        val batch = all.where(col("vec_id") >= nextId)
        val dead = all.where(col("vec_id") >= nextId - batchSize / 10 &&
          col("vec_id") < nextId && col("vec_id") % 10 === 3)
          .select("vec_id")
        val ent = batch.select(col("vec_id").as("query_id"))
          .crossJoin(spark.range(32).select(col("id").as("node")))
        m.onBatch(all, batch, ent, Some(dead))
        nextId += batchSize
        done += 1
      }
      val all = gen(nextId)
      val s = serveSec(all)
      println(f"[fold-depth] depth=$done%d batches " +
        f"(seq ${m.batchesSeen}): serve $s%.2fs")
    }
    val allFinal = gen(nextId).persist()
    allFinal.count()
    val (_, tFold) = timed { m.foldNow() }
    val sAfter = serveSec(allFinal)
    println(f"[fold-depth] foldNow $tFold%.1fs; post-fold serve $sAfter%.2fs")
    spark.stop()
  }
}
