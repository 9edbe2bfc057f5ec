package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** The partial-aggregation top-k must be row-identical to the window
  * formulation, including tie handling and thresholds. */
class TopKSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def queries = emb.orderBy("vec_id").limit(20)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("topKAgg == window topK on testdata (L2)") {
    val a = ExactNN.topK(queries, emb, k = 10, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = ExactNN.topKAgg(queries, emb, k = 10, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
  }

  test("topKAgg == window topK with threshold (cosine)") {
    val a = ExactNN.topK(queries, emb, k = 5, ExactNN.Cosine, threshold = Some(0.8))
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = ExactNN.topKAgg(queries, emb, k = 5, ExactNN.Cosine, threshold = Some(0.8))
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
  }

  test("tie eviction is deterministic: equal dists keep lowest vec_id") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (4L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(0.0, 0.0))).toDF("query_id", "qv")
    val got = ExactNN.topKAgg(q, corpus, k = 3, ExactNN.L2)
      .orderBy("dist", "vec_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((4L, 0.0), (1L, 1.0), (2L, 1.0)))
  }
}
