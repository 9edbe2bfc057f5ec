package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metric edge cases from the reference's unit suite
  * (reference: lsh/lsh_test.go:47-106, 215-226; FIXTURES.md §1), run
  * against BOTH the higher-order-function forms and the codegen
  * expressions — they must agree. */
class VectorFunctionsSpec extends AnyFunSuite with SparkSpecBase {
  import VectorFunctions._

  private def eval2(f: (Column, Column) => Column, a: Seq[Double], b: Seq[Double]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("v"))
      .head().getDouble(0)
  }

  private def checkBoth(hof: (Column, Column) => Column,
                        native: (Column, Column) => Column,
                        a: Seq[Double], b: Seq[Double], expected: Double): Unit = {
    assert(math.abs(eval2(hof, a, b) - expected) < 1e-6, s"hof($a,$b)")
    assert(math.abs(eval2(native, a, b) - expected) < 1e-6, s"native($a,$b)")
  }

  test("cosine distance edge cases (lsh_test.go:47-85)") {
    // zero vector vs anything -> 1.0
    checkBoth(cosineDist, exprs.cosineDistNative, Seq(0.0, 0.0), Seq(1.0, 2.0), 1.0)
    // orthogonal -> 1.0
    checkBoth(cosineDist, exprs.cosineDistNative, Seq(1.0, 0.0), Seq(0.0, 1.0), 1.0)
    // identical -> 0.0
    checkBoth(cosineDist, exprs.cosineDistNative, Seq(1.0, 2.0), Seq(1.0, 2.0), 0.0)
    // opposite -> 2.0
    checkBoth(cosineDist, exprs.cosineDistNative, Seq(1.0, 1.0), Seq(-1.0, -1.0), 2.0)
  }

  test("L2 distance exact values (lsh_test.go:87-106)") {
    checkBoth(l2Dist, exprs.l2DistNative, Seq(0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), 1.0)
    checkBoth(l2Dist, exprs.l2DistNative, Seq(0.0, 0.0), Seq(-4.0, 3.0), 5.0)
  }

  test("dot product and norm") {
    checkBoth(dotProduct, exprs.dotNative, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), 32.0)
    import spark.implicits._
    val n = Seq(Tuple1(Seq(3.0, 4.0))).toDF("a")
      .select(vecNorm(col("a")), exprs.vecNormNative(col("a"))).head()
    assert(math.abs(n.getDouble(0) - 5.0) < 1e-9)
    assert(math.abs(n.getDouble(1) - 5.0) < 1e-9)
  }

  test("float input arrays work without explicit cast (native path)") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(4.0, 6.0))).toDF("a", "b")
    val r = df.select(
      exprs.l2DistNative(col("a"), col("b")).as("l2"),
      l2Dist(col("a"), col("b")).as("l2hof")).head()
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-6)
  }

  test("standard scaler (lsh_test.go:215-226): ((1.5-1)/0.5)*2 elements sum to 2") {
    import spark.implicits._
    val df = Seq((Seq(1.5, 1.5), Seq(1.0, 1.0), Seq(0.5, 0.5))).toDF("v", "m", "s")
    val scaled = df.select(scaleVec(col("v"), col("m"), col("s")).as("out"))
      .select(aggregate(col("out"), lit(0.0), (a, x) => a + x).as("sum"))
      .head().getDouble(0)
    assert(math.abs(scaled - 2.0) < 1e-9)
  }

  test("l2Normalize yields unit norm; zero vector passes through") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3.0, 4.0)), Tuple1(Seq(0.0, 0.0))).toDF("a")
    val norms = df.select(vecNorm(l2Normalize(col("a"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(math.abs(norms(0) - 1.0) < 1e-9)
    assert(norms(1) == 0.0)
  }

  test("l2Normalize computes the norm once, not once per element") {
    import spark.implicits._
    // The norm (sqrt∘aggregate) must be bound as a lambda variable of a
    // one-element transform, NOT referenced inside the per-element
    // division lambda — otherwise it re-evaluates O(d) work d times
    // (the q_embedding_quantize trap, VectorPlanSpec). One aggregate()
    // in the plan = one norm evaluation per row.
    val df = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val plan = df.select(l2Normalize(col("embedding")).as("out"))
      .queryExecution.optimizedPlan.toString
    assert("aggregate\\(".r.findAllIn(plan).length === 1, plan)
  }

  test("mismatched vector lengths yield NULL, never an out-of-bounds read") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val row = df.select(
      graft.functions.exprs.l2DistNative(col("a"), col("b")).as("l2"),
      graft.functions.exprs.cosineDistNative(col("a"), col("b")).as("cos"),
      graft.functions.exprs.dotNative(col("a"), col("b")).as("dot"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("null input arrays yield NULL") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val row = df.select(
      graft.functions.exprs.l2DistNative(col("a"), col("b")).as("l2"),
      graft.functions.exprs.vecNormNative(col("b")).as("nb"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("angular<->cosine distance converters round-trip (helpers.go:239-245)") {
    // known anchor points of sqrt(2(1-cos)) vs 1-cos: orthogonal vectors
    // have cosine distance 1 and chord distance sqrt(2); opposite have 2.
    assert(math.abs(angularToCosineDist(math.sqrt(2.0)) - 1.0) < 1e-12)
    assert(math.abs(cosineDistToAngular(2.0) - 2.0) < 1e-12)
    for (c <- Seq(0.0, 0.1, 0.5, 1.0, 1.7, 2.0))
      assert(math.abs(angularToCosineDist(cosineDistToAngular(c)) - c) < 1e-12)
    // Column forms agree with the scalar forms
    import spark.implicits._
    val row = Seq(Tuple1(0.37)).toDF("c")
      .select(angularToCosineDist(cosineDistToAngular(col("c"))).as("rt"),
        cosineDistToAngular(col("c")).as("ang"))
      .head()
    assert(math.abs(row.getDouble(0) - 0.37) < 1e-12)
    assert(math.abs(row.getDouble(1) - cosineDistToAngular(0.37)) < 1e-12)
  }
}
