package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.stats.VectorStats

/** Distribution-drift watermark for frozen-model index stores — the
  * measured form of the freshness caveat every append path documents
  * ("planes/cells/bounds fitted on the original sample serve arrivals
  * while the data distribution holds"). The occupancy watermark
  * ([[LsmStore]]) counts VOLUME growth since fit; this measures the
  * DISTRIBUTION itself: per-dimension location shift (in fit-MAD
  * units) and spread ratio of an arrivals batch against the stats the
  * model was fit on.
  *
  * Scale contract: the fit corpus is scanned exactly once —
  * [[DriftCheck.writeFitStats]] persists the dims-sized
  * `(pos, mean, mad)` table next to the model at fit time — and every
  * later batch is graded by one aggregate over the BATCH joined to the
  * broadcast stats. The 100 TB corpus is never re-read.
  *
  * Noise caveat (documented, not hidden): a batch of n rows estimates
  * each dimension's mean with standard error ~ mad/√n, so `shift_mads`
  * carries sampling noise ~ 1/√n per dim and the max over d dims rides
  * its extreme order statistic. Size watermarks accordingly: at
  * n = 1,000 and 64 dims, max-shift noise sits around 0.1-0.15 — the
  * 0.5 default is comfortably above it; for tiny batches accumulate
  * arrivals and check on the compaction cadence instead.
  */
object DriftCheck {

  /** Persist the fit-time reference stats (one corpus scan, dims-sized
    * output). Call where the model is fit/saved. */
  def writeFitStats(emb: DataFrame, statsPath: String): Unit =
    VectorStats.meanMad(emb).write.mode("overwrite").parquet(statsPath)
}

final class DriftCheck(
    spark: SparkSession,
    statsPath: String,
    val shiftWatermark: Double = 0.5,
    val ratioWatermark: Double = 2.0) {

  require(shiftWatermark > 0, s"shiftWatermark $shiftWatermark must be > 0")
  require(ratioWatermark > 1, s"ratioWatermark $ratioWatermark must be > 1")

  private def stats = spark.read.parquet(statsPath)

  /** Per-dimension drift of `arrivals` vs the fit stats
    * ([[VectorStats.driftFromStats]] columns). */
  def report(arrivals: DataFrame): DataFrame =
    VectorStats.driftFromStats(stats, arrivals)

  /** (max location shift in fit-MADs, max spread FOLD) over dims —
    * fold = max(ratio, 1/ratio), so widening and narrowing both
    * register. Constant-fit dims (null drift) are skipped. */
  def maxDrift(arrivals: DataFrame): (Double, Double) = {
    val r = report(arrivals).agg(
      max(col("shift_mads")),
      max(greatest(col("mad_ratio"), lit(1.0) / col("mad_ratio")))).head()
    (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
      if (r.isNullAt(1)) 1.0 else r.getDouble(1))
  }

  /** True when either watermark is crossed — the signal to refit the
    * model rather than keep appending through it. */
  def exceeded(arrivals: DataFrame): Boolean = {
    val (s, f) = maxDrift(arrivals)
    s > shiftWatermark || f > ratioWatermark
  }
}
