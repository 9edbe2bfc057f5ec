package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Approximate-sketch aggregates with reference-style tolerance bands
  * (SURVEY.md §5: randomized estimates asserted within a band of truth,
  * like the reference's TestStats): HLL++ distinct counts at two
  * precisions, and a mergeable Theta-style union via the Datasketches
  * hll_sketch_agg surface. These are the sketch operators a 100 TB
  * pipeline uses where exact distinct shuffles would dominate. */
class SketchSpec extends AnyFunSuite with SparkSpecBase {

  private def li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")

  test("approx_count_distinct within 5% of exact on order keys") {
    val exact = li.select(countDistinct("l_orderkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey", 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("hll_sketch_agg: mergeable sketches union across partitions") {
    val perFlag = li.groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    val merged = perFlag.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = li.select(countDistinct("l_orderkey")).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged $merged vs exact $exact")
  }

  test("approx percentile within one unit of exact on quantities") {
    val approx = li.select(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val exact = li.selectExpr("percentile(l_quantity, 0.5)").head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0, s"approx $approx vs exact $exact")
  }
}
