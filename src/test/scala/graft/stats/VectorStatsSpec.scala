package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Sampled-stats tolerance band (mirrors the reference's TestStats,
  * lsh_test.go:151-213: randomized estimates must land within a tolerance
  * of the exact values) and capped-candidate search semantics. */
class VectorStatsSpec extends AnyFunSuite with SparkSpecBase {

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("meanMadSampled within tolerance of exact stats (TestStats band)") {
    val exact = VectorStats.meanMad(emb).collect()
      .map(r => r.getAs[Int]("pos") -> (r.getDouble(1), r.getDouble(2))).toMap
    val sampled = VectorStats.meanMadSampled(emb, sampleSize = 200, seed = 7L)
      .collect().map(r => r.getAs[Int]("pos") -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(sampled.keySet === exact.keySet)
    sampled.foreach { case (pos, (m, mad)) =>
      assert(math.abs(m - exact(pos)._1) <= 0.1, s"mean off at dim $pos")
      assert(math.abs(mad - exact(pos)._2) <= 0.1, s"mad off at dim $pos")
    }
  }

  test("small sampleSize >= total degrades to exact") {
    val exact = VectorStats.meanMad(emb).orderBy("pos").collect().toSeq
    val all = VectorStats.meanMadSampled(emb, sampleSize = 1000000, seed = 7L)
      .orderBy("pos").collect().toSeq
    assert(all === exact)
  }
}
