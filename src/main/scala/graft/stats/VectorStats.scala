package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-dimension statistics and scaling over an embedding column —
  * reference O15/O16 (lsh/helpers.go:45-191).
  *
  * Faithfully reproduces the reference's "std" which is actually **mean
  * absolute deviation**: `sum(sqrt((x-mean)^2))/n = mean(|x-mean|)` — no
  * final sqrt-of-variance (lsh/helpers.go:70-79; SURVEY.md §7.4). The
  * scaler consumes whatever the stats produce, so parity holds end-to-end.
  *
  * Deviation from the reference: stats are computed EXACTLY over the full
  * table instead of over a uniform with-replacement sample
  * (lsh/helpers.go:52-62) — a seeded sample is not reproducible across
  * engines for the oracle, and the exact aggregate is cheap in Spark
  * (one partial+final agg pass, no extra shuffle beyond groupBy(pos) with
  * `dims` distinct keys).
  */
object VectorStats {

  /** Explode (vec_id, embedding) to one row per (vec_id, pos, v) with
    * 1-based positions and DOUBLE values. */
  def explodeDims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(
        col("vec_id"),
        (col("pos") + 1).as("pos"),
        col("col").cast(DoubleType).as("v"))

  /** Per-dimension (pos, mean, mad). The second agg joins the (tiny)
    * means back — Catalyst broadcasts it, so no extra shuffle of the
    * exploded data beyond the two groupBy(pos) passes. */
  def meanMad(emb: DataFrame): DataFrame = {
    val x = explodeDims(emb)
    val means = x.groupBy("pos").agg(avg("v").as("mean"))
    x.join(broadcast(means), "pos")
      .groupBy("pos")
      .agg(
        max(col("mean")).as("mean"), // constant within a pos group
        avg(abs(col("v") - col("mean"))).as("mad"))
  }

  /** Scale every vector elementwise: (x - mean) / mad, one scalar row per
    * (vec_id, pos) (reference StandartScaler.Scale,
    * lsh/helpers.go:173-185). Emitted exploded rather than re-assembled
    * into an array so the result is hash-comparable by the driver's
    * pandas-based oracle (array cells are unhashable there). Elements
    * rounded to `roundTo` decimals for cross-engine comparability. */
  def scaleAll(emb: DataFrame, roundTo: Int = 6): DataFrame = {
    val stats = meanMad(emb)
    val x = explodeDims(emb)
    x.join(broadcast(stats), "pos")
      .select(
        col("vec_id"),
        col("pos"),
        round((col("v") - col("mean")) / col("mad"), roundTo).as("sv"))
  }

  /** Sampled variant — the reference's actual semantics
    * (`GetMeanStdSampled`, lsh/helpers.go:45-118 draws `sampleSize`
    * uniform rows WITH replacement before the per-dimension stats).
    * Spark's `sample(withReplacement = true)` is Poisson sampling — the
    * distributed analog of with-replacement draws (each row's multiplicity
    * ~ Poisson(fraction), expected sample size = sampleSize), so repeated
    * rows weight the estimate exactly as the reference's repeated draws
    * do. The reference's own contract is a ±0.05 tolerance band
    * (lsh_test.go:151-213), which [[graft.stats]]'s spec mirrors. Not
    * oracle-comparable (seeded sampling differs per engine) — the exact
    * [[meanMad]] is the oracle-checked form. */
  def meanMadSampled(emb: DataFrame, sampleSize: Int, seed: Long): DataFrame = {
    val total = emb.count()
    val sampled =
      if (total <= sampleSize) emb
      else emb.sample(withReplacement = true,
        fraction = sampleSize.toDouble / total, seed = seed)
    meanMad(sampled)
  }

  /** Embedding-distribution drift monitor between two corpus snapshots
    * — the check a training-data pipeline runs before trusting a frozen
    * index/model against newly arrived data (every frozen-model surface
    * here documents its freshness caveat in terms of "while the
    * distribution holds": [[graft.ann.lsh.LshIndex.append]],
    * `IvfIndex.append`, the CodesMaintainer watermark; this is the
    * measurement that tells you whether it still does).
    *
    * Per dimension: both snapshots' (mean, mad) plus
    *   - `shift_mads` — |mean_cur − mean_ref| in units of the REFERENCE
    *     MAD (the scale-free location drift; > ~0.5 means the scaler /
    *     quantizer bounds fitted on `ref` are now off-center), and
    *   - `mad_ratio` — mad_cur / mad_ref (spread drift; SQ bounds
    *     saturate when it grows, codes under-use their range when it
    *     shrinks). Both null when the reference dimension is constant
    *     (mad_ref = 0), mirroring SQL `nullif` semantics.
    *
    * Scale shape: two independent exact [[meanMad]] passes (dim-keyed
    * partial aggs, no corpus-sized shuffle) joined on the dims-sized
    * key — the output is `dims` rows regardless of corpus size. */
  def drift(ref: DataFrame, cur: DataFrame, roundTo: Int = 6): DataFrame =
    driftFromStats(meanMad(ref), cur, roundTo)

  /** [[drift]] against PRECOMPUTED reference stats (`(pos, mean, mad)`,
    * i.e. a [[meanMad]] result, typically persisted at fit time) — the
    * serving form: the reference corpus is scanned once when the model
    * is fit, and every later arrivals batch is graded against the tiny
    * stored stats table without touching the corpus again
    * ([[graft.ann.DriftCheck]] wraps exactly this). */
  def driftFromStats(refStats: DataFrame, cur: DataFrame,
                     roundTo: Int = 6): DataFrame = {
    val a = refStats.select(col("pos"),
      col("mean").as("mean_ref"), col("mad").as("mad_ref"))
    val b = meanMad(cur).select(col("pos"),
      col("mean").as("mean_cur"), col("mad").as("mad_cur"))
    a.join(b, "pos").select(
      col("pos"),
      round(col("mean_ref"), roundTo).as("mean_ref"),
      round(col("mean_cur"), roundTo).as("mean_cur"),
      round(col("mad_ref"), roundTo).as("mad_ref"),
      round(col("mad_cur"), roundTo).as("mad_cur"),
      round(abs(col("mean_cur") - col("mean_ref")) /
        nullif(col("mad_ref"), lit(0.0)), roundTo).as("shift_mads"),
      round(col("mad_cur") / nullif(col("mad_ref"), lit(0.0)), roundTo)
        .as("mad_ratio"))
  }

  /** scaleAll re-assembled into an array column ordered by dimension —
    * the library-API shape (not oracle-comparable; see scaleAll). */
  def scaleAllVec(emb: DataFrame, roundTo: Int = 6): DataFrame =
    scaleAll(emb, roundTo)
      .groupBy("vec_id")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("sv")))),
          e => e.getField("sv")).as("scaled"))
}
