package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ivf.{Ivf, IvfConfig}

/** The closed tuning/maintenance loop, end to end on one IVF store:
  *
  *   1. fit + AutoTune pick the cheapest nProbe meeting the target;
  *   2. drifted arrivals append through the FROZEN model —
  *      [[DriftCheck]] fires, and the documented failure mode is
  *      MEASURED, not asserted by prose: arrivals pile into a few
  *      boundary cells, so the coarse partition decays toward a scan
  *      (`Ivf.append`'s caveat, `cellStats` as the skew witness);
  *   3. refit on the grown corpus re-balances the cells and a fresh
  *      sweep re-certifies the recall target.
  *
  * This is the lifecycle every SCALE.md freshness caveat prescribes,
  * run as one spec so the pieces (AutoTune / DriftCheck / append /
  * cellStats / refit) provably compose. */
class DriftLifecycleSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  // clustered corpus around `centre`: 20 clusters x 10 points
  private def mkVecs(n: Int, seed: Int, centre: Double, idBase: Long = 0L) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = i % 20
      val cc = Seq.tabulate(6)(j =>
        new scala.util.Random(c * 17 + j + seed).nextGaussian() * 2 + centre)
      (idBase + i, cc.map(_ + rng.nextGaussian() * 0.2))
    }.toDF("vec_id", "embedding")
  }

  private def topCellShare(idx: graft.ann.ivf.IvfIndex,
                           of: org.apache.spark.sql.DataFrame): Double = {
    val assigned = idx.model.transform(of, "vec_id", "embedding")
    val counts = assigned.groupBy("cell").count()
    val top = counts.agg(max("count")).head().getLong(0).toDouble
    top / of.count()
  }

  test("tune -> drifted appends (watermark + measured cell crowding) -> refit re-certifies") {
    val dir = java.nio.file.Files.createTempDirectory("drift_life").toString
    val fit = mkVecs(1000, seed = 31, centre = 0.0)
    DriftCheck.writeFitStats(fit, s"$dir/fit_stats")
    val idx = Ivf.train(fit, "vec_id", "embedding",
      IvfConfig(nCells = 8, nProbe = 2, seed = 42L))
    val q = fit.orderBy("vec_id").limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))

    // 1. tune: cheapest arm meeting 0.95 on the fit corpus
    val sweep = AutoTune.sweepIvfNProbe(idx, q, 5, Seq(1, 2, 4, 8), 0.95)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(3)))
    val chosen = sweep.find(_._3).get
    assert(chosen._2 >= 0.95, s"tuned arm misses target: $sweep")

    // 2. drifted arrivals: same cluster count, centre moved 10 units
    val arrivals = mkVecs(1000, seed = 33, centre = 10.0, idBase = 10000)
    val dc = new DriftCheck(spark, s"$dir/fit_stats")
    assert(dc.exceeded(arrivals), "drift watermark must fire")

    // the documented decay, measured: fit-time assignment is balanced
    // (8 cells, top share well under 1/2), drifted arrivals crowd into
    // few boundary cells (top share over 1/2) — probe pruning decays
    val fitShare = topCellShare(idx, fit)
    val driftShare = topCellShare(idx, arrivals)
    assert(fitShare < 0.5, s"fit assignment should be balanced: $fitShare")
    assert(driftShare > 0.5,
      s"drifted arrivals should crowd cells: $driftShare")
    assert(driftShare > fitShare * 1.5)

    // frozen-model append still SERVES correctly (the append contract:
    // arrivals are findable; cost, not correctness, is what decayed)
    val grown = idx.append(arrivals)
    val qNew = arrivals.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val served = grown.searchAll(qNew, 1).collect()
    assert(served.forall(r => r.getAs[Double]("dist") == 0.0),
      "each arrival must find itself at dist 0")

    // 3. refit on the grown corpus: balance restored, target re-met
    val corpus2 = fit.unionByName(arrivals)
    val idx2 = Ivf.train(corpus2, "vec_id", "embedding",
      IvfConfig(nCells = 8, nProbe = 2, seed = 42L))
    val refitShare = topCellShare(idx2, arrivals)
    assert(refitShare < driftShare / 1.5,
      s"refit should re-balance: $refitShare vs $driftShare")
    val q2 = corpus2.orderBy("vec_id").limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val sweep2 = AutoTune.sweepIvfNProbe(idx2, q2, 5, Seq(1, 2, 4, 8), 0.95)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(3)))
    assert(sweep2.find(_._3).get._2 >= 0.95,
      s"re-tuned arm misses target: $sweep2")
    // new reference = the grown (bimodal) corpus. A batch drawn from
    // the SAME mixture passes; a pure single-mode batch still flags —
    // correctly: its mean sits a full mode-offset from the mixture
    // mean and its spread is the within-mode MAD, not the mixture's.
    DriftCheck.writeFitStats(corpus2, s"$dir/fit_stats")
    val dc2 = new DriftCheck(spark, s"$dir/fit_stats")
    val mixtureBatch = mkVecs(500, seed = 41, centre = 0.0, idBase = 30000)
      .unionByName(mkVecs(500, seed = 43, centre = 10.0, idBase = 40000))
    assert(!dc2.exceeded(mixtureBatch))
    assert(dc2.exceeded(arrivals),
      "a pure-mode batch against a mixture reference is drift, and stays flagged")
  }
}
