package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** JL sign projection: determinism + balance of the md5 sign matrix,
  * exact agreement with a JVM reference computation, the JL distance-
  * preservation property in expectation, and the zero-shuffle plan. */
class RandomProjectionSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val dIn = 64
  private val dOut = 16

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("sign matrix is deterministic and roughly balanced") {
    val m1 = RandomProjection.signMatrix(dIn, dOut)
    val m2 = RandomProjection.signMatrix(dIn, dOut)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    val mean = m1.flatten.sum / (dIn * dOut)
    assert(math.abs(mean) < 0.2, s"sign matrix unbalanced: mean $mean")
    assert(m1.flatten.forall(s => s == 1.0 || s == -1.0))
  }

  test("projectCol matches a JVM reference computation exactly") {
    val signs = RandomProjection.signMatrix(dIn, dOut)
    val got = emb.select($"vec_id",
        RandomProjection.projectCol($"embedding", dIn, dOut).as("pv"))
      .as[(Long, Seq[Double])].collect().toMap
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    vecs.take(50).foreach { case (id, v) =>
      val expect = signs.map { row =>
        val s = v.indices.foldLeft(0.0)((acc, j) => acc + v(j) * row(j))
        BigDecimal(s / math.sqrt(dOut))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq
      assert(got(id) === expect, s"projection of vec $id")
    }
  }

  test("projected squared L2 distances preserve originals in expectation") {
    // JL: E[||P(a-b)||^2] = ||a-b||^2 for a ±1/sqrt(dOut) sign matrix;
    // individual pairs fluctuate (dOut=16 is aggressive) but the mean
    // ratio over many pairs must sit near 1.
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    val signs = RandomProjection.signMatrix(dIn, dOut)
    def proj(v: Seq[Double]): Array[Double] =
      signs.map(row => v.indices.foldLeft(0.0)((a, j) => a + v(j) * row(j))
        / math.sqrt(dOut))
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    val ratios = (0 until 200).map { i =>
      val (a, b) = (vecs(i), vecs(i + 250))
      d2(proj(a).toSeq, proj(b).toSeq) / d2(a, b)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distortion ratio $mean")
  }

  test("projection is a pure scan-side map — no shuffle in the plan") {
    val plan = emb.select($"vec_id",
        RandomProjection.projectCol($"embedding", dIn, dOut).as("pv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in projection plan:\n$plan")
  }
}
