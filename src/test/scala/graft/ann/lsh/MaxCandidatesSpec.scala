package graft.ann.lsh

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** Deterministic maxCandidates cap (reference O13e, lsh.go:138-162):
  * capped results are a subset of uncapped, bounded per query, and
  * reproducible run to run. */
class MaxCandidatesSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def queries = emb.orderBy("vec_id").limit(20)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("cap is deterministic, bounded per query, and vacuous when huge") {
    val idx = Lsh.train(emb, "vec_id", "embedding",
      LshConfig(nTrees = 10, kMinVecs = 50, seed = 9L))
    val full = idx.searchAll(queries, 10, 1.3, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq

    // cap >= corpus: identical to uncapped
    val vacuous = idx.searchAll(queries, 10, 1.3, ExactNN.L2,
      maxCandidates = Some(1000000))
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(vacuous === full)

    // tight cap: reproducible, <= k rows per query, within threshold
    def run() = idx.searchAll(queries, 10, 1.3, ExactNN.L2,
      maxCandidates = Some(50))
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val c1 = run(); val c2 = run()
    assert(c1 === c2) // deterministic, unlike the reference's map-order cap
    assert(c1.nonEmpty)
    assert(c1.groupBy(_.getLong(0)).values.forall(_.size <= 10))
    assert(c1.forall(_.getDouble(2) <= 1.3))
  }
}
