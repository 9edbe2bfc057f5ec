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

  test("streaming near-dup vs static corpus: band join + Jaccard, stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely unrelated text about spark physical planning rules"),
      (102L, "another unrelated document mentioning parquet column pruning"))
      .toDF("doc_id", "text")
    // doc 0 is a near-dup of corpus doc 100 (last token changed: jac 0.82,
    // collides in 3 of 4 bands — checked against the md5 hash family, so
    // the candidate join is deterministic); doc 1 is novel
    val streamed = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and more"),
      (1L, "nothing like anything in the corpus at all whatsoever today"))

    val mem = MemoryStream[(Long, String)]
    val q = graft.text.Dedup.nearDupAgainstCorpus(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", corpus)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      mem.addData(streamed: _*)
      q.processAllAvailable()
      val streamOut = spark.table("neardup_stream")
        .select("stream_id", "corpus_id", "jac")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // same operator over the same data as plain batch frames
      val batchOut = graft.text.Dedup.nearDupAgainstCorpus(
          streamed.toDF("doc_id", "text"), "doc_id", "text", corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamOut === batchOut)
      assert(streamOut.map(t => (t._1, t._2)) === Set((0L, 100L)))
      assert(streamOut.forall(_._3 >= 0.5))
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
