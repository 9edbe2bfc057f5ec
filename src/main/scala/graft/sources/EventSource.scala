package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical reader for the `events` table — one normalization, two
  * modes (batch `read` / incremental `readStream`), so every consumer
  * (batch queries, streaming jobs) sees the identical schema.
  *
  * The testdata parquet stores TIMESTAMP(NANOS), which Spark 4 refuses
  * as a timestamp type; we read it as raw nanosecond longs (runtime conf)
  * and derive both `ts_us` (microsecond BIGINT — integer `div`, since
  * double division loses precision above 2^53) and a proper `ts`
  * timestamp. DuckDB's `epoch_us` truncates identically, which is what
  * keeps the oracle comparisons exact.
  */
object EventSource {

  /** Raw on-disk schema with ts as nanosecond longs. */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanoseconds since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Batch read. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Incremental read of the same layout (file-based streaming source):
    * new parquet files appearing under `path` become micro-batches. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.readStream.schema(RawSchema).parquet(path))
  }
}
