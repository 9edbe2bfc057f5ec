package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical reader for the `events` table — one normalization, two
  * modes (batch `read` / incremental `readStream`), so every consumer
  * (batch queries, streaming jobs) sees the identical schema.
  *
  * The on-disk `ts` encoding has shifted between driver testdata
  * generations — TIMESTAMP(NANOS) (which Spark 4 refuses as a timestamp
  * type and we read as raw nanosecond longs via the legacy conf) and
  * plain TIMESTAMP/TIMESTAMP_NTZ microseconds — so normalization
  * dispatches on the OBSERVED schema rather than assuming one layout.
  * Every consumer sees the same two derived columns: `ts_us`
  * (microsecond BIGINT — integer `div` for the nanos case, since double
  * division loses precision above 2^53) and a proper `ts` timestamp.
  * DuckDB's `epoch_us` truncates/reads identically on both layouts,
  * which is what keeps the oracle comparisons exact. Sessions must run
  * with `spark.sql.session.timeZone=UTC` (Verify/Bench/test sessions
  * all pin it) so the NTZ→timestamp cast is the identity mapping DuckDB
  * applies to naive parquet timestamps.
  */
object EventSource {

  /** Microsecond epoch BIGINT from whatever `ts` the files carry. */
  private def tsToUs(tsType: DataType): Column = tsType match {
    case LongType => expr("ts div 1000") // legacy TIMESTAMP(NANOS) as raw longs
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType => unix_micros(col("ts"))
    case t => throw new IllegalArgumentException(
      s"events.ts: unsupported type $t (expected nanos BIGINT or timestamp)")
  }

  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts_us", tsToUs(df.schema("ts").dataType))
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Batch read. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Incremental read of the same layout (file-based streaming source):
    * new parquet files appearing under `path` become micro-batches. The
    * stream schema is probed from the files already present at start
    * (file-stream sources require a declared schema; all files in one
    * watched directory share a layout). */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    normalize(spark.readStream.schema(schema).parquet(path))
  }
}
