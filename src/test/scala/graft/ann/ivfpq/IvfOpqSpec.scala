package graft.ann.ivfpq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** IVF-OPQ (OPQ pre-transform + IVF-PQ): isometry means exhaustive
  * settings must reproduce exact search on the ORIGINAL vectors, the
  * lifecycle must encode appends with all three frozen stages
  * (rotation, cells, sub-codebooks), and save/load must round-trip the
  * rotation alongside the quantizers. */
class IvfOpqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val cfg = IvfPqConfig(nCells = 4, nProbe = 4, numSubvectors = 16,
    codesPerSubvector = 16, iters = 5, seed = 42L)

  private def queries(n: Int) = emb.orderBy("vec_id").limit(n)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("full probe + deep rerank == exact top-k on original vectors") {
    val idx = IvfOpq.train(emb, "vec_id", "embedding", cfg, opqIters = 3)
    val q = queries(10)
    val n = emb.count().toInt
    val served = idx.searchRerank(q, emb.select($"vec_id", $"embedding"),
        5, rerankDepth = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = ExactNN.topK(q, emb, 5, ExactNN.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served === exact)
  }

  test("one code row per vector; codes live in the rotated space") {
    val idx = IvfOpq.train(emb, "vec_id", "embedding", cfg, opqIters = 3)
    assert(idx.codes.count() === emb.count())
    assert(idx.codes.select("vec_id").distinct().count() === emb.count())
    // encoding a duplicate of an existing vector through append lands
    // on identical (cell, codes) — all three stages are frozen
    val base = idx.codes.orderBy("vec_id").limit(1).collect()(0)
    val baseId = base.getLong(base.fieldIndex("vec_id"))
    val dup = idx.append(emb.where($"vec_id" === baseId)
        .select(($"vec_id" + 50000L).as("vec_id"), $"embedding"))
      .codes.where($"vec_id" === baseId + 50000L).collect()(0)
    assert(dup.getInt(dup.fieldIndex("cell")) ===
      base.getInt(base.fieldIndex("cell")))
    assert(dup.getSeq[Int](dup.fieldIndex("codes")) ===
      base.getSeq[Int](base.fieldIndex("codes")))
  }

  test("save/load round-trips rotation + quantizers; deletes never served") {
    val idx = IvfOpq.train(emb, "vec_id", "embedding", cfg, opqIters = 3)
    val path = s"/tmp/graft_ivfopq_spec_${ProcessHandle.current().pid()}"
    idx.save(spark, path)
    val re = IvfOpq.load(spark, path)
    assert(re.rotation.r.map(_.toSeq).toSeq ===
      idx.rotation.r.map(_.toSeq).toSeq)
    val q = queries(5)
    val a = idx.searchAll(q, 3).orderBy("query_id", "dist", "vec_id").collect()
    val b = re.searchAll(q, 3).orderBy("query_id", "dist", "vec_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)

    val dead = idx.searchAll(q, 3).select($"vec_id").distinct().limit(2)
    val deadIds = dead.as[Long].collect().toSet
    val served = idx.withDeletes(dead.toDF("vec_id")).searchAll(q, 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(served.intersect(deadIds).isEmpty)
  }
}
