package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Streaming exact dedup: `dropDuplicates` on the content digest holds
  * state across micro-batches, so re-arriving documents are suppressed —
  * the continuous-ingest form of `Dedup.exactGroups` (state bounded by
  * the watermark via dropDuplicatesWithinWatermark at scale). */
class StreamingDedupSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  test("duplicate documents across micro-batches are emitted once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("tkey", md5($"text"))
      .dropDuplicates("tkey")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((0L, "alpha beta"), (1L, "gamma delta"))
      q.processAllAvailable()
      // batch 2: one exact dup of doc 0, one new doc
      mem.addData((2L, "alpha beta"), (3L, "epsilon zeta"))
      q.processAllAvailable()
      val out = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(out === Set(0L, 1L, 3L)) // doc 2 suppressed as a duplicate
    } finally q.stop()
  }

  test("watermarked variant bounds state: dropDuplicatesWithinWatermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = mem.toDF().toDF("doc_id", "ts", "text")
      .withColumn("tkey", md5($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("tkey")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:05:00")
      mem.addData((0L, t0, "alpha"), (1L, t1, "alpha"))
      q.processAllAvailable()
      val out = spark.table("dedup_wm").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(out === Set(0L)) // dup within the watermark window suppressed
    } finally q.stop()
  }
}
