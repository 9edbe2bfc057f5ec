package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Salted two-phase aggregation must be result-identical to the direct
  * form, including on a pathologically skewed key. */
class SaltSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  // 90% of rows share one key — the skew shape
  private def skewed = spark.range(10000)
    .select(
      when($"id" % 10 < 9, 0L).otherwise($"id" % 100).as("k"),
      $"id".as("v"))

  test("saltedCount == direct count on skewed keys") {
    val direct = skewed.groupBy($"k".as("key")).agg(count(lit(1)).as("n"))
      .orderBy("key").collect().toSeq
    val salted = Salt.saltedCount(skewed, $"k", 16, Seq($"v"))
      .orderBy("key").collect().toSeq
    assert(salted === direct)
  }

  test("saltedSum == direct sum") {
    val direct = skewed.groupBy($"k".as("key")).agg(sum($"v").as("total"))
      .orderBy("key").collect().toSeq
    val salted = Salt.saltedSum(skewed, $"k", $"v", 16, Seq($"v"))
      .orderBy("key").collect().toSeq
    assert(salted === direct)
  }

  test("saltedTopK == window top-k on skewed keys") {
    val df = skewed.select($"k", $"v", ($"v" % 997).cast("double").as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("d"), col("v"))
    val direct = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 5)
      .select($"k".as("key"), $"v".as("id"), $"d".as("ord"))
      .orderBy("key", "ord", "id").collect().toSeq
    val salted = Salt.saltedTopK(df, $"k", $"v", $"d", k = 5, saltFactor = 16)
      .orderBy("key", "ord", "id").collect().toSeq
    assert(salted === direct)
  }
}
