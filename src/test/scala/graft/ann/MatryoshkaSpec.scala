package graft.ann

import graft.SparkSpecBase
import org.scalatest.funsuite.AnyFunSuite

class MatryoshkaSpec extends AnyFunSuite with SparkSpecBase {

  /** 4-d corpus engineered so prefix-2 ranking DISAGREES with full-dim
    * ranking: vec 1 is prefix-near / full-far, vec 2 prefix-far /
    * full-near. */
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (0L, Seq(0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.1, 0.0, 5.0, 5.0)), // prefix dist 0.1, full dist ~7.07
      (2L, Seq(1.0, 1.0, 0.1, 0.0)), // prefix dist ~1.41, full dist ~1.42
      (3L, Seq(3.0, 3.0, 3.0, 3.0))  // prefix dist ~4.24, full dist 6.0
    ).toDF("vec_id", "embedding")
  }

  private lazy val queries = {
    import spark.implicits._
    Seq((9L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("query_id", "qv")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy("dist", "vec_id").collect().map(_.getAs[Long]("vec_id")).toSeq

  test("rerank restores full-dim order within the candidate set") {
    // rerankDepth 4 = whole corpus: the prefix stage cannot lose anyone,
    // so the result must EQUAL exact full-dim top-k.
    val got = Matryoshka.searchAll(queries, corpus, k = 3,
      prefixDims = 2, rerankDepth = 4)
    val exact = ExactNN.topK(queries, corpus, k = 3)
    assert(ids(got) == ids(exact))
    // prefix order is (0, 1, 2, 3); full-dim order is (0, 2, 3, 1) —
    // the rerank must demote prefix-near/full-far vec 1 below both
    assert(ids(got) == Seq(0L, 2L, 3L))
  }

  test("prefix stage bounds recall: a prefix-far true neighbor is lost") {
    // rerankDepth 2 keeps prefix-top-2 = {0, 1}; true #2 neighbor (vec 2)
    // ranks 3rd in prefix space and never reaches the rerank.
    val got = Matryoshka.searchAll(queries, corpus, k = 2,
      prefixDims = 2, rerankDepth = 2)
    assert(ids(got) == Seq(0L, 1L))
  }

  test("prefixDims = full dim is exact search regardless of depth") {
    val got = Matryoshka.searchAll(queries, corpus, k = 4,
      prefixDims = 4, rerankDepth = 4)
    val exact = ExactNN.topK(queries, corpus, k = 4)
    assert(ids(got) == ids(exact))
  }

  test("emitted dist is the full-dim metric, rounded") {
    val got = Matryoshka.searchAll(queries, corpus, k = 3,
      prefixDims = 2, rerankDepth = 4)
      .orderBy("dist", "vec_id").collect()
    assert(got.head.getAs[Double]("dist") == 0.0)
    val d2 = got(1).getAs[Double]("dist")
    assert(math.abs(d2 - math.sqrt(1.0 + 1.0 + 0.01)) < 1e-6)
  }

  test("cosine metric flows through both stages") {
    import spark.implicits._
    val c = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val q = Seq((5L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "qv")
    val got = Matryoshka.searchAll(q, c, k = 2, prefixDims = 2,
      rerankDepth = 3, metric = ExactNN.Cosine)
    assert(ids(got) == Seq(0L, 1L))
  }
}
