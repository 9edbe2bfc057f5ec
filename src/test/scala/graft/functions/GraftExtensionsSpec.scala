package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** The registered SQL functions must resolve and agree with the Column
  * API (registerAll path; the builder-time extension applies the same
  * function descriptions via injectFunction). */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpecBase {

  test("SQL surface: l2_dist / cosine_dist / dot_product / vec_norm resolve") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  l2_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2,
        |  cosine_dist(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS cos,
        |  dot_product(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS dot,
        |  vec_norm(array(3.0d, 4.0d)) AS nrm""".stripMargin).head()
    assert(row.getDouble(0) === 5.0)
    assert(row.getDouble(1) === 1.0)
    assert(row.getDouble(2) === 23.0)
    assert(row.getDouble(3) === 5.0)
  }

  test("SQL function works over a table of float arrays") {
    GraftExtensions.registerAll(spark)
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .createOrReplaceTempView("emb_ext")
    val n = spark.sql(
      "SELECT vec_id FROM emb_ext WHERE vec_norm(embedding) > 0").count()
    assert(n > 0)
  }
}
