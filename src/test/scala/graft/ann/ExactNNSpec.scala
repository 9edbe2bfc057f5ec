package graft.ann

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactNNSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val corpus = {
    import spark.implicits._
    // FIXTURES.md §2 mini-index: 4 clustered points + 2 outliers.
    Seq(
      (0L, Seq(0.10, 0.10)),
      (1L, Seq(0.10, 0.08)),
      (2L, Seq(0.11, 0.09)),
      (3L, Seq(0.09, 0.11)),
      (4L, Seq(-0.10, 0.10)),
      (5L, Seq(-0.10, 0.08))
    ).toDF("vec_id", "embedding")
  }

  private lazy val queries = {
    import spark.implicits._
    Seq((0L, Seq(0.10, 0.10))).toDF("query_id", "qv")
  }

  test("self is the closest neighbor, cluster members next (lsh_test.go:242-251)") {
    val got = ExactNN.topK(queries, corpus, k = 4, ExactNN.L2)
      .orderBy("dist", "vec_id").collect()
    assert(got.length == 4)
    assert(got.head.getLong(1) == 0L && got.head.getDouble(2) == 0.0)
    // within the L2 threshold 0.02 the reference expects 3-4 cluster hits
    assert(got.map(_.getLong(1)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("threshold filters candidates (reference distanceThrsh, lsh.go:177)") {
    val got = ExactNN.topK(queries, corpus, k = 10, ExactNN.L2, threshold = Some(0.02))
      .collect()
    // outliers at dist ~0.2 are excluded; all 4 cluster points remain
    assert(got.map(_.getLong(1)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("cosine metric ranks direction, not magnitude") {
    import spark.implicits._
    val c = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(10.0, 0.1)),   // nearly same direction, big magnitude
      (2L, Seq(0.0, 1.0))     // orthogonal
    ).toDF("vec_id", "embedding")
    val q = Seq((7L, Seq(1.0, 0.0))).toDF("query_id", "qv")
    val got = ExactNN.topK(q, c, k = 3, ExactNN.Cosine).orderBy("dist").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("k caps rows per query and every query gets results") {
    import spark.implicits._
    val qs = corpus.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val got = ExactNN.topK(qs, corpus, k = 3, ExactNN.L2)
    val counts = got.groupBy("query_id").count().collect()
    assert(counts.length == 6 && counts.forall(_.getLong(1) == 3L))
  }
}
