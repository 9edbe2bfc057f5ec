package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** Allow-scoped centroid probing at 1M (round 17) — the measurement
  * behind `searchAllScoped` / `scopedFallback`'s claims: does the
  * serve-time scoped path recover the SAME correlated arms the labeled
  * stores recovered ([[LabeledFilteredProbe]] — scoped == labeled on
  * one transient label, so it must), what does the one-call serve cost
  * WITH the transient sidecar aggregate inside it vs the amortized
  * stable-predicate form (scoped view held, sidecar persisted), and
  * what does the full `searchAllFiltered(scopedFallback = true)` path
  * cost end to end (counts + estimator + upgraded serve)?
  *
  * Same corpus recipe and arms as [[LshFilteredProbe]] /
  * [[LabeledFilteredProbe]] (sf0.1 embeddings × replicas with
  * deterministic jitter; `vec_id % m` correlates with geometry), and
  * the API sees ONLY the id allow-list — no label column anywhere.
  *
  * Usage: runMain graft.tools.ScopedFilteredProbe [nQueries=200] [replicas=100]
  */
object ScopedFilteredProbe {
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
      val r = Eval.setPrecisionRecall(df.select("query_id", "vec_id"),
          gt.select("query_id", "vec_id"))
        .withColumn("half",
          when(pmod(col("query_id"), lit(m)) === r0, "dense")
            .otherwise("starved"))
      val overall = r.agg(avg("recall")).head().getDouble(0)
      val halves = r.groupBy("half").agg(round(avg("recall"), 3).as("h"))
        .orderBy("half").collect()
        .map(x => s"${x.getString(0)}=${x.getDouble(1)}").mkString(" ")
      println(f"[sprobe] $tag%-36s serve=$t%.1fs (cold $t0%.1f) " +
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
    println(f"[sprobe] corpus=$n%,d queries=$nQueries lsh train=$tTrain%.1fs")

    for ((tag, m, r) <- arms) {
      val pred = pmod(col("vec_id"), lit(m)) === r
      val allowed = corpus.where(pred).select("vec_id").persist()
      allowed.count()
      val q = corpus.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .localCheckpoint()
      val gt = ExactNN.topKAgg(q, corpus.where(pred), k, ExactNN.L2,
        threshold = Some(thr)).localCheckpoint()
      def probe = idx.searchAll(q, k, thr, ExactNN.L2,
        allowed = Some(allowed))
      val (_, tP0) = time(probe.count())
      report(probe, gt, m, r, s"lsh:$tag probe-filter", tP0, tP0)
      // one-call serve: the transient sidecar aggregate rides inside
      for (mm <- Seq(32, 64, 128)) {
        def serve = idx.searchAllScoped(q, allowed, k, thr, ExactNN.L2,
          maxProbeBuckets = mm)
        val (_, t0) = time(serve.count())
        val (_, t1) = time(serve.count())
        report(serve, gt, m, r, s"lsh:$tag scoped M=$mm one-call", t1, t0)
      }
      // amortized stable-predicate form: hold the view, persist the
      // sidecar once, serve from it
      val (view, tSide) = time {
        val v = idx.scopedTo(allowed)
        v.bucketCentroids.persist().count()
        v
      }
      def amort = view.searchAllLabeled(
        q.withColumn("label", lit(graft.ann.FilteredSearch.ScopedLabel)),
        k, thr, ExactNN.L2)
      val (_, tA0) = time(amort.count())
      val (_, tA1) = time(amort.count())
      report(amort, gt, m, r,
        f"lsh:$tag scoped M=64 amortized (sidecar=$tSide%.1fs)", tA1, tA0)
      view.bucketCentroids.unpersist()
      // the full dispatch path: counts + estimator + upgraded serve
      def fb = idx.searchAllFiltered(q, allowed, k, thr, ExactNN.L2,
        scopedFallback = true)
      val (_, tF0) = time(fb.count())
      report(fb, gt, m, r, s"lsh:$tag scopedFallback e2e", tF0, tF0)
      allowed.unpersist(); gt.unpersist()
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
    println(f"[sprobe] ivf train=$tIvf%.1fs (nCells=1024 nProbe=32)")
    for ((tag, m, r) <- arms) {
      val pred = pmod(col("vec_id"), lit(m)) === r
      val allowed = corpus.where(pred).select("vec_id").persist()
      allowed.count()
      val q = corpus.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .localCheckpoint()
      val gt = ExactNN.topKAgg(q, corpus.where(pred), k, ExactNN.L2)
        .localCheckpoint()
      def probe = ivf.searchAll(q, k, ExactNN.L2, allowed = Some(allowed))
      val (_, tP0) = time(probe.count())
      report(probe, gt, m, r, s"ivf:$tag probe-filter", tP0, tP0)
      for (np <- Seq(32, 64)) {
        def serve = ivf.searchAllScoped(q, allowed, k, ExactNN.L2,
          nProbe = np)
        val (_, t0) = time(serve.count())
        val (_, t1) = time(serve.count())
        report(serve, gt, m, r, s"ivf:$tag scoped nProbe=$np one-call",
          t1, t0)
      }
      def fb = ivf.searchAllFiltered(q, allowed, k, ExactNN.L2,
        scopedFallback = true)
      val (_, tF0) = time(fb.count())
      report(fb, gt, m, r, s"ivf:$tag scopedFallback e2e", tF0, tF0)
      allowed.unpersist(); gt.unpersist()
    }
    spark.stop()
  }
}
