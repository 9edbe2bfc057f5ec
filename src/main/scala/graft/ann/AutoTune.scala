package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.ivf.IvfIndex
import graft.ann.lsh.LshIndex
import graft.eval.Eval

/** Recall-targeted operating-point selection — the production form of
  * the reference's benchmark sweep (annbench.go:165-187 measures a
  * recall/latency grid by hand; a deployment needs the grid walked FOR
  * it). Each index family exposes one monotone cost knob (IVF: cells
  * probed per query; LSH: trees probed per query — both price recall
  * linearly in candidate volume, measured sweeps in SCALE.md). `sweep`
  * grades every arm's recall against the exact ground truth on a
  * validation query sample and flags the cheapest arm that meets the
  * target — sample-in, config-out, so the expensive full-corpus
  * serving config is chosen from a bounded validation workload.
  *
  * Scale shape: the ground truth is computed ONCE (bounded
  * queries x k rows, persisted) and re-joined per arm; each arm is one
  * index search at that operating point — the sweep costs `sum(arms)`
  * searches on the SAMPLE queries, not the corpus-sized serving
  * workload. The chosen-arm rule runs on an |arms|-row frame via a
  * single-row cross join (no windows, nothing driver-side).
  */
object AutoTune {

  /** Grade `arms` (ascending cost order) on `queries` vs exact ground
    * truth over `corpus`; returns one row per arm
    * `(arm, avg_recall, n_queries, chosen)` where `chosen` marks the
    * first arm whose average recall meets `targetRecall` (falling back
    * to the last arm — "best available" — when none does).
    *
    * `searchAt` runs the family's search at one operating point;
    * `dumpArm` lets the certification queries persist each arm's raw
    * predictions for the cross-engine oracle (identity by default). */
  def sweep(arms: Seq[Int], queries: DataFrame, corpus: DataFrame, k: Int,
            targetRecall: Double,
            searchAt: Int => DataFrame,
            metric: ExactNN.Metric = ExactNN.L2,
            dumpArm: (Int, DataFrame) => DataFrame = (_, df) => df)
      : DataFrame = {
    require(arms.nonEmpty, "AutoTune.sweep: empty arm list")
    require(arms == arms.sorted && arms.distinct == arms,
      s"AutoTune.sweep: arms must be strictly ascending (got $arms)")
    val gt = ExactNN.topKAgg(queries, corpus, k, metric)
      .select("query_id", "vec_id").persist()
    gt.count()
    val perArm = arms.map { a =>
      val pred = dumpArm(a, searchAt(a))
      Eval.setPrecisionRecall(pred, gt)
        .agg(round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
        .select(lit(a).as("arm"), col("avg_recall"), col("n_queries"))
    }.reduce(_ unionByName _)
    val graded = perArm.persist()
    graded.count()
    gt.unpersist(false)
    // cheapest arm meeting target, else the last (best-effort) arm —
    // one row, broadcast back over the |arms|-row frame
    val choice = graded.agg(
      min(when(col("avg_recall") >= targetRecall, col("arm")))
        .as("first_meeting"),
      max(col("arm")).as("last_arm"))
    val out = graded.crossJoin(broadcast(choice))
      .select(col("arm"), col("avg_recall"), col("n_queries"),
        (col("arm") === coalesce(col("first_meeting"), col("last_arm")))
          .as("chosen"))
      .persist()
    out.count() // materialize, then release the per-arm scaffold
    graded.unpersist(false)
    out
  }

  /** IVF sweep over `nProbe` (cells probed per query). Each arm is an
    * independent `withNProbe(p).searchAll` — the simple form;
    * [[sweepIvfNProbeShared]] is the row-identical one-scan form. */
  def sweepIvfNProbe(idx: IvfIndex, queries: DataFrame, k: Int,
                     arms: Seq[Int], targetRecall: Double,
                     metric: ExactNN.Metric = ExactNN.L2,
                     dumpArm: (Int, DataFrame) => DataFrame = (_, df) => df)
      : DataFrame =
    sweep(arms, queries, idx.vectors, k, targetRecall,
      p => idx.withNProbe(p).searchAll(queries, k, metric),
      metric, dumpArm)

  /** [[sweepIvfNProbe]] with the candidate scan SHARED across arms:
    * probe ordering is deterministic by (distance, cell), so arm p's
    * probe set is exactly the first p cells of the max arm's ordering
    * — and each vector lives in exactly one cell, so scoring the max
    * arm's candidates ONCE with the probe rank carried lets every
    * smaller arm cut `probe_rank < p` from the same persisted frame.
    * Collapses |arms| corpus-candidate scans to one; per-arm work
    * shrinks to a filter + the bounded TopK over the persisted frame.
    * Row-identical to the per-arm form (AutoTuneSpec pins all arms).
    *
    * Footprint: the persisted scored frame is |queries| × corpus ×
    * maxArm/nCells rows — at maxArm == nCells, the full queries ×
    * corpus product (which the per-arm form never materializes past
    * the map side). That is bounded ONLY because `queries` is
    * contractually the small validation sample (the [[sweep]]
    * scale-shape doc); for a sweep whose top arm probes every cell
    * over a large validation set, prefer [[sweepIvfNProbe]] and pay
    * the scans. */
  def sweepIvfNProbeShared(idx: IvfIndex, queries: DataFrame, k: Int,
                           arms: Seq[Int], targetRecall: Double,
                           metric: ExactNN.Metric = ExactNN.L2,
                           dumpArm: (Int, DataFrame) => DataFrame =
                             (_, df) => df): DataFrame = {
    require(arms.nonEmpty, "sweepIvfNProbeShared: empty arm list")
    val m = idx.withNProbe(arms.max).model
    val probes = queries
      .select(col("query_id"),
        posexplode(graft.ann.ivf.IvfExpressions.ivfProbes(m, col("qv"))))
      .select(col("query_id"), col("pos").as("probe_rank"),
        col("col").as("cell"))
    val scored = idx.cells
      .join(broadcast(probes), "cell")
      .select("query_id", "vec_id", "probe_rank")
      .join(idx.vectors, "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"))), "query_id")
      .select(col("query_id"), col("vec_id"), col("probe_rank"),
        round(metric.dist(col("qv"), col("embedding")), 6).as("dist"))
      .persist()
    scored.count()
    try
      sweep(arms, queries, idx.vectors, k, targetRecall,
        p => graft.ann.TopK.perQueryTopK(
          scored.where(col("probe_rank") < p)
            .select("query_id", "vec_id", "dist"),
          k, viaAggregator = true),
        metric, dumpArm)
    finally scored.unpersist(false)
  }

  /** IVF-PQ sweep over `rerankDepth` — the compressed families' recall
    * knob (the quantized scan orders candidates only coarsely; the
    * exact re-rank over the top `depth` does the last stretch, and
    * depth must scale with probed rows — the SCALE.md rerank-depth
    * rule this sweep finds the floor of empirically). `vectors` is the
    * float table re-ranking reads ((vec_id, embedding), L2 — the
    * metric `IvfPqIndex.searchRerank` serves). */
  def sweepIvfPqRerankDepth(idx: graft.ann.ivfpq.IvfPqIndex,
                            queries: DataFrame, vectors: DataFrame, k: Int,
                            arms: Seq[Int], targetRecall: Double,
                            dumpArm: (Int, DataFrame) => DataFrame =
                              (_, df) => df): DataFrame =
    sweep(arms, queries, vectors, k, targetRecall,
      d => idx.searchRerank(queries, vectors, k, rerankDepth = d),
      ExactNN.L2, dumpArm)

  /** LSH sweep over the number of trees probed (the forest-density
    * knob of SCALE.md's round-8 sweep: leaner forests walk the
    * latency/recall curve down smoothly once occupancy is sized). */
  def sweepLshTrees(idx: LshIndex, queries: DataFrame, k: Int,
                    arms: Seq[Int], targetRecall: Double,
                    metric: ExactNN.Metric = ExactNN.L2,
                    distanceThreshold: Double = Double.MaxValue,
                    dumpArm: (Int, DataFrame) => DataFrame = (_, df) => df)
      : DataFrame =
    sweep(arms, queries, idx.vectors, k, targetRecall,
      t => idx.withTrees(t).searchAll(queries, k, distanceThreshold, metric),
      metric, dumpArm)
}
