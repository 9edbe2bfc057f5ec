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
