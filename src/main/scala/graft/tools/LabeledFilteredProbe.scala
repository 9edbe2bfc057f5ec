package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** The label-partitioned bucket stores at 1M (round 17) — the
  * measurement behind the re-pointed `probe_starved` / bimodal
  * warnings: do the correlated arms the round-16 dispatch could only
  * WARN about (LSH corr50 probe-then-filter 0.551; IVF corr50 0.94
  * average hiding a ~0.88 starved half; LSH corr10 0.24 / IVF corr10
  * 0.62 before the auto-exact dispatch) recover on label-conditional
  * centroid-ranked serving, at what probe budget (the
  * [[graft.ann.lsh.LabeledLshIndex.DefaultMaxProbeBuckets]] knee), and
  * at what build/serve cost vs the probe path.
  *
  * History the defaults encode (both measured in this round, this
  * probe's earlier revisions): (1) tree-PATH probe selection — the
  * greedy forced-turn descent with best-first alternatives — saturated
  * at 0.915 on the corr50 arm even at 32 probes/tree × 20 trees, while
  * centroid ranking over ONE tree's buckets reached 0.942 at M=32; the
  * descent selector was replaced, not tuned. (2) For IVF, occupancy
  * scoping is VACUOUS under an even-split filter (the label occupies
  * every cell): global-centroid ranking held the starved half at 0.883
  * while label-conditional ranking at the same budget served 0.99.
  *
  * Corpus and predicates: the LshFilteredProbe recipe (sf0.1 embeddings
  * replicated with deterministic jitter; `vec_id % m` correlates with
  * geometry because replicas of one base point share the residue).
  * Labels are the predicate columns themselves, so the labeled arms
  * serve the EXACT same subsets the round-16 arms filtered. Per-half
  * recall (dense = allowed own cluster, starved = disallowed) makes
  * the bimodal story explicit.
  *
  * Usage: runMain graft.tools.LabeledFilteredProbe [nQueries=200] [replicas=100]
  */
object LabeledFilteredProbe {
  def main(args: Array[String]): Unit = {
    val nQueries = if (args.nonEmpty) args.head.toInt else 200
    val replicas = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()
    val corpus = spark.range(replicas).crossJoin(base)
      .select(
        (col("id") * baseN + col("vec_id")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 50000.0).as("embedding"))
      .persist()
    val n = corpus.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val k = 10
    val thr = 1e9
    val arms = Seq(("corr50", 2, 0), ("corr10", 10, 3))

    def report(df: DataFrame, gt: DataFrame, m: Int, r0: Int, tag: String,
               t: Double, t0: Double): Unit = {
      // dense = the query's OWN cluster is allowed (query_id % m == the
      // arm's target residue); everything else is starved — the residue
      // must be the arm's own r (a hardcoded 0-or-3 test silently
      // bucketed corr10's %10==0 queries as dense, round-17 self-review)
      val r = Eval.setPrecisionRecall(df.select("query_id", "vec_id"),
          gt.select("query_id", "vec_id"))
        .withColumn("half",
          when(pmod(col("query_id"), lit(m)) === r0, "dense")
            .otherwise("starved"))
      val overall = r.agg(avg("recall")).head().getDouble(0)
      val halves = r.groupBy("half").agg(round(avg("recall"), 3).as("h"))
        .orderBy("half").collect()
        .map(x => s"${x.getString(0)}=${x.getDouble(1)}").mkString(" ")
      println(f"[lprobe] $tag%-32s serve=$t%.1fs (cold $t0%.1f) " +
        f"recall=$overall%.3f $halves")
    }

    // ---------------- LSH ----------------
    val (idx, tTrain) = time {
      val i = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 20, kMinVecs = 80, seed = 42L,
          sampleCap = 100000))
      i.buckets.persist().count()
      i.vectors.persist().count()
      i
    }
    println(f"[lprobe] corpus=$n%,d queries=$nQueries lsh train=$tTrain%.1fs")

    for ((tag, m, r) <- arms) {
      val labels = corpus.select(col("vec_id"),
        pmod(col("vec_id"), lit(m)).cast("string").as("label"))
      val (store, tBuild) = time {
        val st = idx.withLabels(labels)
        st.labeledBuckets.persist().count()
        st.bucketCentroids.persist().count()
        st
      }
      val q = corpus.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          lit(r.toString).as("label"))
        .localCheckpoint()
      val pred = pmod(col("vec_id"), lit(m)) === r
      val gt = ExactNN.topKAgg(q, corpus.where(pred), k, ExactNN.L2,
        threshold = Some(thr)).localCheckpoint()
      def probe = idx.searchAll(q, k, thr, ExactNN.L2,
        allowed = Some(corpus.where(pred).select("vec_id")))
      val (_, tP0) = time(probe.count())
      report(probe, gt, m, r, s"lsh:$tag probe-filter " +
        f"(build=$tBuild%.1fs)", tP0, tP0)
      for (mm <- Seq(16, 32, 64, 128)) {
        def serve = store.searchAllLabeled(q, k, thr, ExactNN.L2,
          maxProbeBuckets = mm)
        val (_, t0) = time(serve.count())
        val (_, t1) = time(serve.count())
        report(serve, gt, m, r, s"lsh:$tag labeled M=$mm", t1, t0)
      }
      // pooled-trees reference: does a second tree's re-cut buy recall
      // at the default budget, or only redundant probes?
      if (tag == "corr50") {
        val (st2, tB2) = time {
          val s2 = idx.withLabels(labels, centroidTrees = 2)
          s2.bucketCentroids.persist().count()
          s2
        }
        def serve2 = st2.searchAllLabeled(q, k, thr, ExactNN.L2,
          maxProbeBuckets = 64)
        val (_, t0) = time(serve2.count())
        val (_, t1) = time(serve2.count())
        report(serve2, gt, m, r,
          f"lsh:$tag labeled trees=2 M=64 (build=$tB2%.1fs)", t1, t0)
        st2.bucketCentroids.unpersist()
      }
      store.labeledBuckets.unpersist()
      store.bucketCentroids.unpersist()
      gt.unpersist()
    }
    idx.buckets.unpersist(); idx.vectors.unpersist()

    // ---------------- IVF ----------------
    val (ivf, tIvf) = time {
      val i = Ivf.train(corpus, "vec_id", "embedding",
        IvfConfig(nCells = 1024, nProbe = 32, seed = 42L,
          sampleCap = 100000))
      i.cells.persist().count()
      i.vectors.persist().count()
      i
    }
    println(f"[lprobe] ivf train=$tIvf%.1fs (nCells=1024 nProbe=32)")
    for ((tag, m, r) <- arms) {
      val labels = corpus.select(col("vec_id"),
        pmod(col("vec_id"), lit(m)).cast("string").as("label"))
      val (store, tBuild) = time {
        val st = ivf.withLabels(labels)
        st.labeledCells.persist().count()
        st.cellCentroids.persist().count()
        st
      }
      val q = corpus.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          lit(r.toString).as("label"))
        .localCheckpoint()
      val pred = pmod(col("vec_id"), lit(m)) === r
      val gt = ExactNN.topKAgg(q, corpus.where(pred), k, ExactNN.L2)
        .localCheckpoint()
      def probe = ivf.searchAll(q, k, ExactNN.L2,
        allowed = Some(corpus.where(pred).select("vec_id")))
      val (_, tP0) = time(probe.count())
      report(probe, gt, m, r, s"ivf:$tag probe-filter " +
        f"(build=$tBuild%.1fs)", tP0, tP0)
      for (np <- Seq(32, 64)) {
        def serve = store.searchAllLabeled(q, k, ExactNN.L2, nProbe = np)
        val (_, t0) = time(serve.count())
        val (_, t1) = time(serve.count())
        report(serve, gt, m, r, s"ivf:$tag labeled nProbe=$np", t1, t0)
      }
      store.labeledCells.unpersist()
      store.cellCentroids.unpersist()
      gt.unpersist()
    }
    spark.stop()
  }
}
