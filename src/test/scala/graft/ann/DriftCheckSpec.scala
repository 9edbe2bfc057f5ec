package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Drift watermark for frozen-model stores: fit stats persisted once,
  * arrivals batches graded against them; the maintainer warns and
  * exposes the measurement when a batch has left the fit envelope. */
class DriftCheckSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkVecs(n: Int, seed: Int, shift: Double = 0.0,
                     scale: Double = 1.0, idBase: Long = 0L) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (idBase + i,
        Seq.fill(4)(rng.nextGaussian() * scale + shift)))
      .toDF("vec_id", "embedding")
  }

  test("in-distribution arrivals stay under the watermarks") {
    val dir = java.nio.file.Files.createTempDirectory("drift_ok").toString
    DriftCheck.writeFitStats(mkVecs(2000, seed = 1), s"$dir/fit_stats")
    val dc = new DriftCheck(spark, s"$dir/fit_stats")
    val arrivals = mkVecs(1000, seed = 2, idBase = 10000)
    val (s, f) = dc.maxDrift(arrivals)
    assert(s < 0.5, s"shift $s") // ~3x the 1/sqrt(n) noise floor
    assert(f < 1.5, s"fold $f")
    assert(!dc.exceeded(arrivals))
  }

  test("location-shifted and spread-shifted arrivals trip the watermarks") {
    val dir = java.nio.file.Files.createTempDirectory("drift_bad").toString
    DriftCheck.writeFitStats(mkVecs(2000, seed = 1), s"$dir/fit_stats")
    val dc = new DriftCheck(spark, s"$dir/fit_stats")
    val shifted = mkVecs(1000, seed = 3, shift = 2.0, idBase = 10000)
    assert(dc.exceeded(shifted))
    assert(dc.maxDrift(shifted)._1 > 1.0)
    val widened = mkVecs(1000, seed = 4, scale = 3.0, idBase = 10000)
    assert(dc.exceeded(widened))
    assert(dc.maxDrift(widened)._2 > 2.0)
    // narrowing registers too: fold = max(r, 1/r)
    val narrowed = mkVecs(1000, seed = 5, scale = 0.3, idBase = 10000)
    assert(dc.exceeded(narrowed))
    assert(dc.maxDrift(narrowed)._2 > 2.0)
  }

  test("CodesMaintainer surfaces the batch drift measurement") {
    val fit = mkVecs(2000, seed = 7)
    val dir = java.nio.file.Files.createTempDirectory("drift_maint").toString
    DriftCheck.writeFitStats(fit, s"$dir/fit_stats")
    // SQ store: fit the model, persist base codes, maintain under drift
    val idx = graft.ann.sq.Sq.train(fit, "vec_id", "embedding")
    idx.save(spark, s"$dir/idx")
    val m = new CodesMaintainer(spark, s"$dir/idx",
      encode = a => idx.model.transformDf(a, "vec_id", "embedding"),
      compactEvery = 100,
      driftCheck = Some(new DriftCheck(spark, s"$dir/fit_stats")))
    assert(m.lastDrift.isEmpty)
    m.onBatch(Some(mkVecs(1000, seed = 8, idBase = 10000)), None)
    val inDist = m.lastDrift.get
    assert(inDist._1 < 0.5 && inDist._2 < 1.5)
    m.onBatch(Some(mkVecs(1000, seed = 9, shift = 3.0, idBase = 20000)), None)
    val drifted = m.lastDrift.get
    assert(drifted._1 > 1.0, s"shift ${drifted._1}")
    // deletes-only batches have no arrivals to grade, so they leave the
    // last measurement UNTOUCHED — lastDrift is "the most recent batch's
    // ARRIVALS" by contract; a caller polling it after a delete batch
    // must still see the drift that was measured
    m.onBatch(None, Some(Seq(10001L).toDF("vec_id")))
    assert(m.lastDrift === Some(drifted))
  }

  test("LshMaintainer surfaces the batch drift measurement") {
    val fit = mkVecs(2000, seed = 21)
    val dir = java.nio.file.Files.createTempDirectory("drift_lsh").toString
    DriftCheck.writeFitStats(fit, s"$dir/fit_stats")
    val idx = graft.ann.lsh.Lsh.train(fit, "vec_id", "embedding",
      graft.ann.lsh.LshConfig(nTrees = 2, kMinVecs = 32, seed = 3L))
    idx.save(spark, s"$dir/idx")
    val m = new graft.ann.lsh.LshMaintainer(spark, s"$dir/idx",
      compactEvery = 100,
      driftCheck = Some(new DriftCheck(spark, s"$dir/fit_stats")))
    assert(m.lastDrift.isEmpty)
    m.onBatch(Some(mkVecs(1000, seed = 22, idBase = 10000)), None)
    assert(m.lastDrift.get._1 < 0.5)
    m.onBatch(Some(mkVecs(1000, seed = 23, shift = 3.0, idBase = 20000)), None)
    val drifted = m.lastDrift.get
    assert(drifted._1 > 1.0)
    // deletes-only batch keeps the last measured drift (same contract
    // as CodesMaintainer)
    m.onBatch(None, Some(Seq(10001L).toDF("vec_id")))
    assert(m.lastDrift === Some(drifted))
  }
}
