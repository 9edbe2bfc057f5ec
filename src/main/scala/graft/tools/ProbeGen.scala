package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixtures for the scale probes: ONE deterministic clustered
  * corpus generator and one wall-clock timer, so every probe-derived
  * SCALE.md number is measured over the same geometry — a shape tweak
  * here moves all probes together instead of silently breaking their
  * cross-comparability (they used to carry byte-identical private
  * copies). Geometry: 10-point clusters in 64-d (the GraphScaleProbe
  * shape), ids dense from 0, fully deterministic by id via xxhash64 —
  * any engine (including the DuckDB oracle) can regenerate any row. */
object ProbeGen {

  /** (vec_id, embedding) rows for ids [0, upTo). */
  def clustered(spark: SparkSession, upTo: Long): DataFrame =
    spark.range(upTo).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(floor(col("id") / 10), i), lit(2000))
          .cast("double") - 1000.0) / 250.0
          + (pmod(xxhash64(col("id"), i), lit(2000))
            .cast("double") - 1000.0) / 5000.0).as("embedding"))

  /** Wall-clock a thunk: (result, seconds). */
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
