package graft.ann.lsh

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** The native hash/probe expressions must agree exactly with the
  * driver-side Scala-array path, for float parquet input and double
  * literal input, in both metrics (angular exercises the normalization
  * scratch copy). */
class LshExpressionsSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def check(angular: Boolean): Unit = {
    val model = Lsh.fit(emb, "embedding",
      LshConfig(nTrees = 7, kMinVecs = 30, angular = angular, seed = 13L))
    val viaExpr = emb.limit(100)
      .select($"vec_id", LshExpressions.lshHashes(model, $"embedding").as("h"),
        LshExpressions.lshProbes(model, $"embedding").as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getSeq[Long](2).toSeq))
    val vecs = emb.limit(100)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap
    viaExpr.foreach { case (id, hs, ps) =>
      assert(hs === model.hashes(vecs(id)).toSeq, s"hashes differ for $id")
      assert(ps === model.probes(vecs(id)).toSeq, s"probes differ for $id")
    }
  }

  test("expression path == Scala path (L2, float parquet input)") {
    check(angular = false)
  }

  test("expression path == Scala path (angular: normalization copy)") {
    check(angular = true)
  }

  test("double-typed input works without cast") {
    val model = Lsh.fit(emb, "embedding", LshConfig(nTrees = 4, kMinVecs = 20, seed = 2L))
    val df = Seq((1L, Seq(0.5, -0.25) ++ Seq.fill(62)(0.0))).toDF("vec_id", "embedding")
    val viaExpr = df.select(LshExpressions.lshHashes(model, $"embedding"))
      .head().getSeq[Long](0).toSeq
    val direct = model.hashes((Seq(0.5, -0.25) ++ Seq.fill(62)(0.0)).toArray).toSeq
    assert(viaExpr === direct)
  }
}
