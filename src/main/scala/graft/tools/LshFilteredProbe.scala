package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** The bucket-index filtered-dispatch measurement (round 16) — the 1M
  * point the round-15 verdict called missing: a geometry-correlated
  * 10%-selective filter on LSH, plus the full correlation × selectivity
  * 2×2, measuring for each arm the [[graft.ann.lsh.LshIndex
  * .filteredDecision]] route + estimator cost, the FIXED
  * probe-then-filter path's recall/latency, the auto dispatch
  * ([[graft.ann.lsh.LshIndex.searchAllFiltered]], density rule on),
  * and the exact subset scan (the dispatch target) — all against the
  * exact FILTERED ground truth.
  *
  * Corpus: the ScaleProbe recipe (sf0.1 embeddings replicated K-fold
  * with deterministic jitter → 1M at K=100; replicas of one base point
  * form a tight micro-cluster). Predicates: `vec_id % m` is CORRELATED
  * with geometry (baseN % m == 0, so a micro-cluster is all-in or
  * all-out); `xxhash64(vec_id) % m` is uncorrelated (each micro-cluster
  * holds ~1/m allowed replicas).
  *
  * Usage: runMain graft.tools.LshFilteredProbe [nQueries=200] [replicas=100]
  */
object LshFilteredProbe {
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
    val queries = corpus.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (idx, tTrain) = time {
      val i = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 20, kMinVecs = 80, seed = 42L,
          sampleCap = 100000))
      i.buckets.persist().count()
      i.vectors.persist().count()
      i
    }
    println(f"[fprobe] corpus=$n%,d queries=$nQueries train=${tTrain}%.1fs " +
      "(nTrees=20 kMin=80 cap=100k)")

    val k = 10
    val thr = 1e9
    val arms = Seq(
      ("corr10", pmod(col("vec_id"), lit(10)) === 3),
      ("uncorr10", pmod(xxhash64(col("vec_id")), lit(10)) === 3),
      ("corr50", pmod(col("vec_id"), lit(2)) === 0),
      ("uncorr50", pmod(xxhash64(col("vec_id")), lit(2)) === 0))

    for ((tag, pred) <- arms) {
      val allowed = corpus.where(pred).select("vec_id").localCheckpoint()
      val nA = allowed.count()
      val gt = ExactNN.topKAgg(queries, corpus.where(pred), k, ExactNN.L2,
        threshold = Some(thr)).localCheckpoint()
      def rec(df: org.apache.spark.sql.DataFrame): Double =
        Eval.setPrecisionRecall(df.select("query_id", "vec_id"),
            gt.select("query_id", "vec_id"))
          .agg(avg("recall")).head().getDouble(0)
      // decision (estimator cost measured on its own)
      val (d, tDec) = time(idx.filteredDecision(queries, allowed, k,
        allowedCount = Some(nA), corpusCount = Some(n)))
      // fixed probe-then-filter (the round-15 behavior above the cutoff)
      def probe = idx.searchAll(queries, k, thr, ExactNN.L2,
        allowed = Some(allowed))
      val (_, tP0) = time(probe.count())
      val (_, tP) = time(probe.count())
      val pRec = rec(probe)
      // auto dispatch (decision + serve, counts supplied)
      def auto = idx.searchAllFiltered(queries, allowed, k, thr, ExactNN.L2,
        allowedCount = Some(nA), corpusCount = Some(n))
      val (_, tA0) = time(auto.count())
      val (_, tA) = time(auto.count())
      val aRec = rec(auto)
      // the dispatch target on its own
      def exact = ExactNN.topKAgg(queries,
        corpus.where(pred).select(col("vec_id"), col("embedding")), k,
        ExactNN.L2, threshold = Some(thr))
      val (_, tE) = time(exact.count())
      println(f"[fprobe] $tag%-9s sel=${nA.toDouble / n}%.3f " +
        f"median=${d.medianLocalAllowed.getOrElse(-1.0)}%.1f " +
        f"q25=${d.lowQuartileLocalAllowed.getOrElse(-1.0)}%.1f " +
        f"bimodal=${d.bimodalStarved(k)} " +
        f"route=${d.route.name}%-17s est=${tDec}%.1fs | " +
        f"probe=${tP}%.1fs (cold ${tP0}%.1f) recall=$pRec%.3f | " +
        f"auto=${tA}%.1fs (cold ${tA0}%.1f) recall=$aRec%.3f | " +
        f"exact=${tE}%.1fs")
      allowed.unpersist(); gt.unpersist()
    }
    idx.buckets.unpersist(); idx.vectors.unpersist()

    // ---- the IVF twin, same arms ----
    // The IVF estimator's stated caveat is GRANULARITY: the own-cell
    // neighborhood blurs when cells are barely larger than the
    // beamWidth cut (the 200k-shape spec geometry needed nCells sized
    // so cells ≈ real neighborhoods). At 1M with nCells=1024 a cell
    // holds ~1000 rows >> 32, so the top-32 cut IS local — this block
    // measures whether the dispatch discriminates there (the
    // green-at-gate-doesn't-transfer trap, checked for IVF).
    val (ivf, tIvfTrain) = time {
      val i = Ivf.train(corpus, "vec_id", "embedding",
        IvfConfig(nCells = 1024, nProbe = 32, seed = 42L,
          sampleCap = 100000))
      i.cells.persist().count()
      i.vectors.persist().count()
      i
    }
    println(f"[fprobe] ivf train=${tIvfTrain}%.1fs (nCells=1024 " +
      "nProbe=32 cap=100k)")
    for ((tag, pred) <- arms) {
      val allowed = corpus.where(pred).select("vec_id").localCheckpoint()
      val nA = allowed.count()
      val gt = ExactNN.topKAgg(queries, corpus.where(pred), k, ExactNN.L2)
        .localCheckpoint()
      def rec(df: org.apache.spark.sql.DataFrame): Double =
        Eval.setPrecisionRecall(df.select("query_id", "vec_id"),
            gt.select("query_id", "vec_id"))
          .agg(avg("recall")).head().getDouble(0)
      val (d, tDec) = time(ivf.filteredDecision(queries, allowed, k,
        allowedCount = Some(nA), corpusCount = Some(n)))
      def probe = ivf.searchAll(queries, k, ExactNN.L2,
        allowed = Some(allowed))
      val (_, tP0) = time(probe.count())
      val (_, tP) = time(probe.count())
      val pRec = rec(probe)
      def auto = ivf.searchAllFiltered(queries, allowed, k, ExactNN.L2,
        allowedCount = Some(nA), corpusCount = Some(n))
      val (_, tA0) = time(auto.count())
      val (_, tA) = time(auto.count())
      val aRec = rec(auto)
      println(f"[fprobe] ivf:$tag%-9s sel=${nA.toDouble / n}%.3f " +
        f"median=${d.medianLocalAllowed.getOrElse(-1.0)}%.1f " +
        f"q25=${d.lowQuartileLocalAllowed.getOrElse(-1.0)}%.1f " +
        f"bimodal=${d.bimodalStarved(k)} " +
        f"route=${d.route.name}%-17s est=${tDec}%.1fs | " +
        f"probe=${tP}%.1fs (cold ${tP0}%.1f) recall=$pRec%.3f | " +
        f"auto=${tA}%.1fs (cold ${tA0}%.1f) recall=$aRec%.3f")
      allowed.unpersist(); gt.unpersist()
    }
    spark.stop()
  }
}
