package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.queries.RetrievalQueries
import graft.text.TextFunctions

/** Streaming lexical retrieval: keyword queries arrive as a stream and
  * score against a STATIC per-(doc, term) BM25 partial-score table
  * (`RetrievalQueries.termScores(d, None)` — the precomputed index a
  * deployment would persist). The stream explodes each query's terms
  * (stateless), stream-static joins on term, and runs ONE streaming
  * aggregation `sum(tscore)` per (query_id, doc_id) — per-query top-k
  * then lives in the sink/foreachBatch, because a second stateful
  * ranking stage behind a complete-mode aggregation is the shape
  * streaming does not allow. Scores must equal the batch
  * [[RetrievalQueries.bm25]] path exactly (same rounding). */
class StreamingRetrievalSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  test("streamed keyword queries x static term index == batch bm25 scores") {
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

    val queryTerms: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("dup"),
      2L -> Seq("spark", "window"),
      3L -> Seq("vector", "query", "fast"))

    val qtermsDf = queryTerms
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val batch = RetrievalQueries.bm25(d, qtermsDf)
      .orderBy("query_id", "doc_id").collect().toSeq

    // Static half: the full per-(doc, term) partial-score index.
    val index = RetrievalQueries.termScores(d, None)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[String])]
    val scored = mem.toDF().toDF("query_id", "terms")
      .select(col("query_id"), explode(col("terms")).as("term"))
      .join(index, "term") // stream-static equi-join on term
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("tscore")), 6).as("score"))
    val q = scored.writeStream.format("memory").queryName("stream_bm25")
      .outputMode("complete").start()
    try {
      mem.addData(queryTerms.take(2): _*)
      q.processAllAvailable()
      mem.addData(queryTerms.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_bm25")
        .orderBy("query_id", "doc_id").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streamed sparse query-weight vectors x static postings == batch sparse dot") {
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

    // Static half: the full (doc_id, term, w) postings index.
    val index = RetrievalQueries.sparseWeights(d, None)
    index.persist().count()

    // Queries are the first 3 docs' own weight vectors (query-by-
    // example, the q_sparse_dot_topk shape).
    val qRows = index.where(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("term"), col("w").as("qw"))
      .as[(Long, String, Double)].collect().toSeq

    val batch = index
      .join(qRows.toDF("query_id", "term", "qw"), "term")
      .where(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("qw") * col("w")), 6).as("score"))
      .orderBy("query_id", "doc_id").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val scored = mem.toDF().toDF("query_id", "term", "qw")
      .join(index, "term") // stream-static equi-join on term
      .where(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("qw") * col("w")), 6).as("score"))
    val q = scored.writeStream.format("memory").queryName("stream_sparse")
      .outputMode("complete").start()
    try {
      val (first, rest) = qRows.partition(_._1 < 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(rest: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_sparse")
        .orderBy("query_id", "doc_id").collect().toSeq
      assert(streamed === batch)
    } finally { q.stop(); index.unpersist() }
  }

  test("foreachBatch doc appends to the stored postings == direct batch appends") {
    val all = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val base = all.where(col("doc_id") < 40L)
    val arrivalRows = all.where(col("doc_id") >= 40L && col("doc_id") < 50L)
      .as[(Long, Seq[String])].collect().toSeq
    val (b1, b2) = arrivalRows.partition(_._1 < 45L)

    def mk(tag: String) = graft.retrieval.PostingsStore.build(spark,
      java.nio.file.Files.createTempDirectory(tag).toString + "/idx", base)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map { r =>
        r.schema.fieldNames.sorted.map(f => r.get(r.fieldIndex(f)))
          .mkString("|")
      }.toSet

    // batch twin: two direct onBatch calls
    val pBatch = mk("postings_sb_batch")
    pBatch.onBatch(Some(b1.toDF("doc_id", "toks")), None)
    pBatch.onBatch(Some(b2.toDF("doc_id", "toks")), None)

    // streaming twin: the same arrivals through foreachBatch
    val pStream = mk("postings_sb_stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[String])]
    val q = mem.toDF().toDF("doc_id", "toks")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batchDf.isEmpty) pStream.onBatch(Some(batchDf), None)
        ()
      }
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(rows(pStream.sparse) === rows(pBatch.sparse),
      "stream != batch stored sparse postings")
    assert(rows(pStream.bm25) === rows(pBatch.bm25),
      "stream != batch stored bm25 postings")
    // frozen-df property: the arrivals' weights used the BASE stats —
    // identical across twins even though a full rebuild over base +
    // arrivals would produce different df
    assert(pStream.batchesSeen === 2)
  }
}
