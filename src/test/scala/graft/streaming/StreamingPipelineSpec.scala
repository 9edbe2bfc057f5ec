package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.text.TextFunctions._

/** Streaming twins of the ingest-time training-data pipeline stages:
  * mixture sampling and repetition-quality filtering are pure per-row
  * projections (no aggregation state), so the exact batch column works
  * under `readStream` and stream output must equal the batch decision
  * row-for-row. The per-row quality form trades the batch chain's
  * linear tagged-explode aggregation for O(uniq·n)-per-doc HOFs — the
  * right side of the trade only when rows arrive one micro-batch at a
  * time (see TextFunctions.repetitionStats).
  */
class StreamingPipelineSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val rates = graft.queries.TextQueries.MixtureRates

  test("streaming mixture sampling keeps exactly the batch-kept doc_ids") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 200L).map(i => (i, s"src${i % 7}"))
    val batchKept = docs.toDF("doc_id", "source")
      .where(mixtureKeep(col("source"), col("doc_id"), rates))
      .select("doc_id").as[Long].collect().toSet
    // the rate table must actually bind: some source gets rate < 1.0
    assert(batchKept.size < docs.size && batchKept.nonEmpty)

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "source")
      .where(mixtureKeep(col("source"), col("doc_id"), rates))
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(97) // uneven micro-batches
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val streamKept = spark.table("mix_stream").select("doc_id")
        .as[Long].collect().toSet
      assert(streamKept === batchKept)
    } finally q.stop()
  }

  test("per-row repetition stats match the batch aggregation exactly on real docs") {
    implicit val sqlCtx = spark.sqlContext
    // ground truth: the oracle-gated batch query over sf0.001 documents
    val batch = graft.queries.TextQueries
      .queries("q_repetition_quality")(spark, sf("sf0.001"))
      .select("doc_id", "unique_ratio", "top_tok_frac", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(batch.nonEmpty)
    assert(batch.values.exists(_._3) && batch.values.exists(!_._3),
      "thresholds must split the corpus for the comparison to mean anything")

    val rows = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .where(size(tokens(col("text"))) >= 2)
      .select(col("doc_id"),
        repetitionStats(tokens(col("text"))).as("stats"))
      .select(col("doc_id"),
        round(col("stats.unique_ratio"), 6).as("unique_ratio"),
        round(col("stats.top_tok_frac"), 6).as("top_tok_frac"))
      .writeStream.format("memory").queryName("rep_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
      val streamed = spark.table("rep_stream").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (id, (ur, tf)) =>
        val (bur, btf, bkeep) = batch(id)
        assert(ur === bur && tf === btf, s"doc $id stats diverge")
        val keep = ur >= graft.queries.TextQueries.RepMinUniqueRatio &&
          tf <= graft.queries.TextQueries.RepMaxTopTokFrac
        assert(keep === bkeep, s"doc $id keep decision diverges")
      }
    } finally q.stop()
  }
}
