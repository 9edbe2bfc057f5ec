package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.streaming.BudgetStream.DocTok
import graft.text.TextFunctions._

/** Stream==batch for the per-source token-budget cut, on the real
  * documents table, fed across uneven micro-batches in the md5 order
  * the batch window uses. */
class StreamingBudgetSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val budget = 150L

  private def docToks = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_toks"))

  test("jvmHash60 mirrors TextFunctions.hash60 bit-for-bit") {
    val got = docToks.limit(50)
      .select(col("doc_id"), hash60(21, col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect()
    got.foreach { case (id, h) =>
      assert(h === BudgetStream.jvmHash60(21, id.toString), s"doc $id")
    }
  }

  test("streaming budget cut == batch window cut, row-identically") {
    implicit val sqlCtx = spark.sqlContext
    val w = Window.partitionBy("source").orderBy("ord", "doc_id")
    val start = coalesce(sum(col("n_toks")).over(
      w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val batch = docToks
      .withColumn("ord", hash60(21, col("doc_id").cast("string")))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (start < budget).as("kept"))
      .as[(Long, String, Long, Boolean)].collect().toSet
    // the cut must bind: both kept and dropped rows exist
    assert(batch.exists(_._4) && batch.exists(!_._4))

    // feed in the same md5 order, split unevenly across micro-batches
    val ordered = docToks.as[(Long, String, Long)].collect()
      .sortBy(d => (BudgetStream.jvmHash60(21, d._1.toString), d._1))
      .map(d => DocTok(d._1, d._2, d._3))
    val mem = MemoryStream[DocTok]
    val q = BudgetStream.tokenBudget(mem.toDS(), budget)
      .writeStream.format("memory").queryName("budget_stream")
      .outputMode("append").start()
    try {
      val (a, rest) = ordered.splitAt(137)
      val (b, c) = rest.splitAt(101)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      mem.addData(c: _*); q.processAllAvailable()
      val streamed = spark.table("budget_stream")
        .as[(Long, String, Long, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
