package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduled maintenance for a stored (bucketed) graph index under
  * streaming inserts — the enforcement of the degree-growth caveat on
  * [[GraphSearch.insert]]: `maxReverseDegree` caps a node's new
  * in-links PER BATCH, so over B batches an attractive hub still
  * accumulates up to k + B × cap edges, inflating every later walk's
  * frontier (per-hop cost is beamWidth × degree). The insert
  * amortization story therefore REQUIRES a periodic re-bound pass; this
  * class makes that requirement executable instead of prose:
  *
  *   - [[onBatch]] runs one insert+append maintenance step (the
  *     foreachBatch body of StreamingGraphInsertSpec) and counts it;
  *   - every `refineEvery` batches it triggers [[refineNow]] — rescore
  *     the stored edges exactly, cut every node back to its best k
  *     out-edges (the degree restore), run [[NnDescent.refine]] rounds
  *     to recover edge quality, re-union the connectivity backbone, and
  *     rewrite the bucketed store;
  *   - between refines, an optional degree watermark
  *     (`degreeWatermark` > 0) warns when the stored max degree has
  *     outgrown the expected k + refineEvery × cap envelope — the
  *     [[graft.ann.lsh.Lsh.fit]] occupancy-warning pattern: loud,
  *     cheap, non-fatal.
  *
  * Driver-side state is one Int (the batch counter) — safe inside
  * `foreachBatch`, which runs on the driver. All heavy work is
  * DataFrame jobs: the insert walk (bounded frontier), the edge rescore
  * (one O(E) join pair), the refine (bounded co-neighbor joins), the
  * bucketed rewrite (one shuffle by src).
  */
final class GraphMaintainer(
    spark: SparkSession,
    name: String,
    idCol: String,
    vecCol: String,
    k: Int,
    beamWidth: Int,
    hops: Int,
    refineEvery: Int,
    maxReverseDegree: Int = 2,
    degreeWatermark: Int = 0,
    refineIterations: Int = 1,
    backbone: Boolean = true,
    metric: ExactNN.Metric = ExactNN.Cosine,
    roundTo: Int = 6,
    nBuckets: Int = 64) {

  require(refineEvery > 0, s"refineEvery $refineEvery must be positive")

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private var batches = 0

  /** Insert batches applied since construction (refines don't reset — the
    * cadence is "every Nth batch", not "N since last manual refine"). */
  def batchesSeen: Int = batches

  /** True when the NEXT [[onBatch]] call will trigger the scheduled
    * refine — exposed so callers can align checkpoints around it. */
  def refineDue: Boolean = (batches + 1) % refineEvery == 0

  /** One streaming maintenance step: beam-insert `newVectors` against
    * the stored graph, append the delta (edges touching an arriving id)
    * to the bucketed store, and run the scheduled refine when due.
    * `vectors` must cover existing AND arriving ids (the walk scores
    * against it; the refine rescans it). Returns the appended delta.
    *
    * The delta filter is two semi-joins against the arriving id set —
    * never a collected id list, so a large micro-batch cannot build an
    * unbounded `isin` literal. */
  def onBatch(vectors: DataFrame, newVectors: DataFrame,
              entries: DataFrame): DataFrame = {
    val stored = GraphSearch.loadBucketed(spark, name)
    val extended = GraphSearch.insert(
      stored.withColumn("dist", lit(2.0)), vectors, idCol, vecCol,
      newVectors, k, beamWidth, hops, entries,
      maxReverseDegree, metric, roundTo, symmetrize = false)
    val newIds = newVectors.select(col(idCol).as("nid"))
    val delta = extended
      .join(newIds, col("src") === col("nid"), "left_semi")
      .unionByName(extended
        .join(newIds, col("dst") === col("nid"), "left_semi"))
      .dropDuplicates("src", "dst")
      .select(col("src"), col("dst"), col("dist"))
    GraphSearch.appendBucketed(delta, name, nBuckets)
    batches += 1
    if (batches % refineEvery == 0) refineNow(vectors)
    else if (degreeWatermark > 0) {
      val maxDeg = maxStoredDegree
      if (maxDeg > degreeWatermark) log.warn(
        s"stored graph '$name' max degree $maxDeg exceeds watermark " +
          s"$degreeWatermark after $batches insert batches: reverse-link " +
          s"accumulation is outrunning the refine cadence (every " +
          s"$refineEvery) — lower refineEvery or maxReverseDegree " +
          "(GraphSearch.insert degree-growth caveat).")
    }
    delta
  }

  /** Max per-node degree in the stored (symmetrized) table — one
    * src-keyed aggregate over the bucketed layout (no shuffle of the
    * edge table; the bucket files are already clustered by src). */
  def maxStoredDegree: Long = {
    val r = GraphSearch.loadBucketed(spark, name)
      .groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** The re-bound pass: exact-rescore every stored edge, keep each
    * node's best k out-edges (restoring the degree invariant globally —
    * the accumulated reverse links must re-compete with the original
    * neighbors instead of stacking on top of them), run
    * `refineIterations` NN-Descent rounds over the cut graph to recover
    * neighbor-of-neighbor quality, re-union the deterministic backbone
    * (the k-cut ranks long-range links last and would sever exactly the
    * connectivity they exist for), and rewrite the bucketed store. The
    * refined DIRECTED graph (≤ k out-edges per node, exact rounded
    * dists) is returned for callers that track it; the store persists
    * its symmetrized+backboned form.
    *
    * The refined frame is localCheckpoint-materialized BEFORE the store
    * rewrite — Spark refuses to overwrite a table still being read, and
    * every frame here descends from the stored table. */
  def refineNow(vectors: DataFrame): DataFrame = {
    val stored = GraphSearch.loadBucketed(spark, name)
    val va = vectors.select(col(idCol).as("src"), col(vecCol).as("va"))
    val vb = vectors.select(col(idCol).as("dst"), col(vecCol).as("vb"))
    val scored = stored
      .join(va, "src")
      .join(vb, "dst")
      .select(col("src"), col("dst"),
        round(metric.dist(col("va"), col("vb")), roundTo).as("dist"))
    val cut = TopK.perQueryTopK(
        scored.select(col("src").as("query_id"), col("dst").as("vec_id"),
          col("dist")),
        k, viaAggregator = true)
      .select(col("query_id").as("src"), col("vec_id").as("dst"),
        col("dist"))
    val refined = NnDescent.refine(cut, vectors, idCol, vecCol, k, metric,
        refineIterations, roundTo = roundTo)
      .localCheckpoint()
    val withBackbone =
      if (backbone)
        refined.select(col("src"), col("dst"))
          .unionByName(GraphSearch.randomBackbone(vectors, idCol))
          .dropDuplicates("src", "dst")
      else refined
    GraphSearch.saveBucketed(withBackbone, name, nBuckets)
    log.info(s"stored graph '$name' refined after $batches insert batches " +
      s"(max degree now $maxStoredDegree)")
    refined
  }
}
