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

  test("drift of a snapshot against itself is zero shift, ratio 1") {
    val d = VectorStats.drift(emb, emb).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      assert(r.getAs[Double]("shift_mads") === 0.0)
      assert(r.getAs[Double]("mad_ratio") === 1.0)
    }
  }

  test("drift detects a planted location + scale shift per dimension") {
    import spark.implicits._
    val ref = (0 until 200).map { i =>
      val rng = new scala.util.Random(i)
      (i.toLong, Seq.fill(3)(rng.nextGaussian()))
    }.toDF("vec_id", "embedding")
    // dim 1 shifted by +5, dim 2 doubled in spread, dim 3 untouched
    val cur = ref.select($"vec_id",
      array($"embedding" (0) + 5.0, $"embedding" (1) * 2.0,
        $"embedding" (2)).as("embedding"))
    val d = VectorStats.drift(ref, cur).orderBy("pos").collect()
    assert(d.length === 3)
    val madRef1 = d(0).getAs[Double]("mad_ref")
    assert(math.abs(d(0).getAs[Double]("shift_mads") - 5.0 / madRef1) < 1e-4)
    assert(math.abs(d(1).getAs[Double]("mad_ratio") - 2.0) < 1e-4)
    assert(d(2).getAs[Double]("shift_mads") === 0.0)
    assert(d(2).getAs[Double]("mad_ratio") === 1.0)
  }

  test("constant reference dimension yields null drift columns, not a crash") {
    import spark.implicits._
    val ref = (0 until 50).map(i => (i.toLong, Seq(1.0, i.toDouble)))
      .toDF("vec_id", "embedding")
    val cur = (0 until 50).map(i => (i.toLong, Seq(2.0, i.toDouble)))
      .toDF("vec_id", "embedding")
    val d = VectorStats.drift(ref, cur).orderBy("pos").collect()
    assert(d(0).isNullAt(d(0).fieldIndex("shift_mads")))
    assert(d(0).isNullAt(d(0).fieldIndex("mad_ratio")))
    assert(!d(1).isNullAt(d(1).fieldIndex("shift_mads")))
  }
}
