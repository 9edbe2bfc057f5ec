package graft.ann.lsh

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}

/** Label-partitioned bucket stores ([[LshIndex.withLabels]] /
  * `IvfIndex.withLabels` → `searchAllLabeled`) — the round-17 in-family
  * remediation behind the bucket dispatch's `probe_starved` / bimodal
  * warnings. Contracts:
  *
  *   - RECOVERY where the dispatch can only warn: on the
  *     [[BucketFilteredDispatchSpec]] geometry's starved-LARGE arm
  *     (cluster-correlated ~17%, above the auto-exact ceiling — route
  *     `probe_starved`) and on the bimodal even-split arm, label-scoped
  *     serving must beat the collapsed probe-then-filter path by a wide
  *     margin and clear an absolute recall bar vs the exact filtered
  *     ground truth;
  *   - the scoped probe's MAX-PREFIX contract (LSH): per (query, tree),
  *     the rank-0 probe shares the longest possible path prefix with
  *     the query's own leaf among ALL leaves the label occupies — the
  *     greedy forced-turn descent's defining property, which
  *     `q_lsh_filtered_labeled` re-checks in DuckDB;
  *   - the IVF probe rule is exactly "the nProbe nearest OCCUPIED
  *     cells, (distance, cell) order" — brute-recomputed here;
  *   - label purity, per-query labels, unknown labels, multi-label
  *     rows, duplicate label rows, same-fitted-model (no refit), and
  *     save/load round-trips.
  */
class LabeledBucketSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val K = 5

  // the BucketFilteredDispatchSpec geometry: 200 clusters x 10 points,
  // 32-d; cluster-level labels make every label a geometric region (the
  // correlated-filter regime the labeled store exists for)
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(200)(Array.fill(32)(rnd.nextGaussian()))
    (0 until 2000).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
  }

  // label6 = cluster % 6 (the ~17% starved-large arm when filtering one
  // value); label2 = cluster % 2 (the bimodal even-split arm)
  private def labels6: DataFrame =
    corpus.select($"vec_id",
      pmod(($"vec_id" / 10).cast("long"), lit(6)).cast("string").as("label"))
  private def labels2: DataFrame =
    corpus.select($"vec_id",
      pmod(($"vec_id" / 10).cast("long"), lit(2)).cast("string").as("label"))

  private lazy val idx = Lsh.train(corpus, "vec_id", "embedding",
    LshConfig(nTrees = 8, kMinVecs = 40, angular = true, seed = 7L))
  private lazy val lidx6 = idx.withLabels(labels6)
  private lazy val lidx2 = idx.withLabels(labels2)

  private lazy val ivf = Ivf.train(corpus, "vec_id", "embedding",
    IvfConfig(nCells = 200, nProbe = 8, seed = 5L))
  private lazy val livf6 = ivf.withLabels(labels6)

  private def queriesWith(label: String): DataFrame =
    corpus.orderBy("vec_id").limit(40)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"),
        lit(label).as("label"))
      .localCheckpoint()

  private def recallOf(pred: DataFrame, gt: DataFrame): Double =
    graft.eval.Eval.setPrecisionRecall(pred.select("query_id", "vec_id"),
        gt.select("query_id", "vec_id"))
      .agg(avg("recall")).as[Double].head()

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select($"query_id", $"vec_id", $"dist")
      .as[(Long, Long, Double)].collect().toSet

  test("starved-large arm: labeled serving recovers where probe-then-filter collapses") {
    val pred = pmod(($"vec_id" / 10).cast("long"), lit(6)) === 0
    val q = queriesWith("0")
    val gt = ExactNN.topKAgg(q, corpus.where(pred), K, ExactNN.Cosine)
      .localCheckpoint()
    val probeRec = recallOf(
      idx.searchAll(q, K, Double.MaxValue, ExactNN.Cosine,
        allowed = Some(corpus.where(pred).select("vec_id"))), gt)
    val labeledRec = recallOf(
      lidx6.searchAllLabeled(q, K, Double.MaxValue, ExactNN.Cosine), gt)
    info(f"starved-large: probe=$probeRec%.3f labeled=$labeledRec%.3f")
    assert(probeRec < 0.8, f"arm not collapsed ($probeRec%.3f) — geometry drifted")
    assert(labeledRec >= 0.9, f"labeled recall $labeledRec%.3f below bar")
    assert(labeledRec >= probeRec + 0.2, "labeled must beat probe widely")
  }

  test("bimodal even-split arm: labeled serving recovers the starved half") {
    val pred = pmod(($"vec_id" / 10).cast("long"), lit(2)) === 0
    val q = queriesWith("0")
    val gt = ExactNN.topKAgg(q, corpus.where(pred), K, ExactNN.Cosine)
      .localCheckpoint()
    // per-query recalls: the starved half lives in odd clusters
    def perQueryMin(df: DataFrame): Double =
      graft.eval.Eval.setPrecisionRecall(df.select("query_id", "vec_id"),
          gt.select("query_id", "vec_id"))
        .agg(min("recall")).as[Double].head()
    val labeled = lidx2.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine)
    val labeledRec = recallOf(labeled, gt)
    val labeledMin = perQueryMin(labeled)
    info(f"bimodal: labeled avg=$labeledRec%.3f min=$labeledMin%.3f")
    assert(labeledRec >= 0.9, f"labeled recall $labeledRec%.3f below bar")
    assert(labeledMin >= 0.4,
      f"worst-query recall $labeledMin%.3f — the starved half did not recover")
  }

  test("probesPerTree knee: the default is read off the measured curve") {
    val pred = pmod(($"vec_id" / 10).cast("long"), lit(6)) === 0
    val q = queriesWith("0")
    val gt = ExactNN.topKAgg(q, corpus.where(pred), K, ExactNN.Cosine)
      .localCheckpoint()
    val curve = Seq(1, 2, 4, 8, 16).map { p =>
      p -> recallOf(lidx6.searchAllLabeled(q, K, Double.MaxValue,
        ExactNN.Cosine, probesPerTree = p), gt)
    }
    info(curve.map { case (p, r) => f"p=$p:$r%.3f" }.mkString(" "))
    // monotone non-decreasing (more probes only add candidates)
    curve.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9, s"recall fell from p=$pa to p=$pb")
    }
    val byP = curve.toMap
    assert(byP(graft.ann.lsh.LabeledLshIndex.DefaultProbesPerTree) >=
      byP(2) , "default must sit at or past the knee")
  }

  test("LSH scoped rank-0 probe satisfies the max-common-prefix contract") {
    val q = queriesWith("0")
    val probes = lidx6.scopedProbeRows(q)
      .where($"probe_rank" === 0)
      .select($"query_id", $"tree_id", $"hash")
      .as[(Long, Int, Long)].collect()
    val own = idx.model.transform(q, "query_id", "qv")
      .select($"query_id", $"tree_id", $"hash")
      .as[(Long, Int, Long)].collect()
      .map { case (qid, t, h) => (qid, t) -> h }.toMap
    val occ = lidx6.labeledBuckets.where($"label" === "0")
      .select($"tree_id", $"hash").distinct()
      .as[(Int, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2) }
    def lcp(a: Long, b: Long): Int =
      if (a == b) 64 else java.lang.Long.numberOfTrailingZeros(a ^ b)
    assert(probes.nonEmpty)
    probes.foreach { case (qid, t, scoped) =>
      val oh = own((qid, t))
      val best = occ(t).map(lcp(oh, _)).max
      assert(occ(t).contains(scoped), s"probe ($qid, $t) not occupied")
      assert(lcp(oh, scoped) === best,
        s"query $qid tree $t: scoped LCP ${lcp(oh, scoped)} < max $best")
    }
  }

  test("served rows are label-pure and per-query labels bind independently") {
    // half the queries filter label 1, half label 4 — each query's
    // results must come exclusively from ITS label's partition
    val q = corpus.orderBy("vec_id").limit(40)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"),
        when(pmod($"vec_id", lit(2)) === 0, lit("1")).otherwise(lit("4"))
          .as("label"))
      .localCheckpoint()
    val served = lidx6.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine)
    val joined = served
      .join(labels6.select($"vec_id", $"label".as("vl")), "vec_id")
      .join(q.select($"query_id", $"label".as("ql")), "query_id")
    assert(joined.where($"vl" =!= $"ql").count() === 0L,
      "a served row crossed its query's label partition")
    // and each label's queries match a single-label serve of the same set
    val q1 = q.where($"label" === "1")
    val solo = lidx6.searchAllLabeled(q1, K, Double.MaxValue,
      ExactNN.Cosine)
    val mixed1 = served.join(q1.select("query_id"), "query_id")
    assert(rows(mixed1) === rows(solo), "mixed-label serve diverged")
  }

  test("unknown label serves empty, not an error") {
    val q = queriesWith("no-such-label")
    assert(lidx6.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine).count() === 0L)
    val qi = queriesWith("no-such-label")
    assert(livf6.searchAllLabeled(qi, K, ExactNN.L2).count() === 0L)
  }

  test("withLabels reuses the fitted model (no refit) and tolerates duplicate label rows") {
    assert(lidx6.model eq idx.model)
    assert(livf6.model eq ivf.model)
    val dup = idx.withLabels(labels6.unionByName(labels6))
    val q = queriesWith("0")
    assert(rows(dup.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine)) ===
      rows(lidx6.searchAllLabeled(q, K, Double.MaxValue, ExactNN.Cosine)))
  }

  test("multi-label rows serve in every partition their labels name") {
    // give vec 0..9 (cluster 0, label6=0) an extra label "x"
    val extra = corpus.where($"vec_id" < 10)
      .select($"vec_id", lit("x").as("label"))
    val multi = idx.withLabels(labels6.unionByName(extra))
    val q = queriesWith("x")
    val served = multi.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine)
    assert(served.select("vec_id").distinct().as[Long].collect()
      .forall(_ < 10L))
    assert(served.count() > 0L)
    // and the original partition still serves them too
    val q0 = queriesWith("0")
    val ids0 = multi.searchAllLabeled(q0, K, Double.MaxValue,
        ExactNN.Cosine)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(ids0.exists(_ < 10L) || ids0.nonEmpty)
  }

  test("IVF scoped probes are exactly the nProbe nearest occupied cells") {
    val q = queriesWith("2")
    val probes = livf6.scopedProbeRows(q)
      .select($"query_id", $"cell", $"probe_rank")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).map { case (qid, rs) =>
        qid -> rs.sortBy(_._3).map(_._2).toSeq }
    val occupied = livf6.labeledCells.where($"label" === "2")
      .select("cell").distinct().as[Int].collect().toSet
    val qvs = q.select($"query_id", $"qv".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def d2(a: Seq[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    qvs.foreach { case (qid, qv) =>
      val expected = ivf.model.centroids.indices
        .map(c => (d2(qv, ivf.model.centroids(c)), c))
        .sorted
        .map(_._2)
        .filter(occupied)
        .take(ivf.model.config.nProbe)
      assert(probes(qid) === expected, s"query $qid probe order diverged")
    }
  }

  test("IVF labeled serving recovers the starved-large arm") {
    val pred = pmod(($"vec_id" / 10).cast("long"), lit(6)) === 0
    val q = queriesWith("0")
    val gt = ExactNN.topKAgg(q, corpus.where(pred), K, ExactNN.L2)
      .localCheckpoint()
    val probeRec = recallOf(
      ivf.searchAll(q, K, ExactNN.L2,
        allowed = Some(corpus.where(pred).select("vec_id"))), gt)
    val labeledRec = recallOf(livf6.searchAllLabeled(q, K, ExactNN.L2), gt)
    info(f"ivf starved-large: probe=$probeRec%.3f labeled=$labeledRec%.3f")
    assert(labeledRec >= 0.9, f"labeled recall $labeledRec%.3f below bar")
    assert(labeledRec >= probeRec,
      "labeled must not lose to probe-then-filter")
  }

  test("save/load round-trips both labeled stores") {
    val dir = java.nio.file.Files.createTempDirectory("labeled").toString
    val q = queriesWith("0")
    lidx6.save(spark, s"$dir/lsh")
    val lshBack = LabeledLshIndex.load(spark, s"$dir/lsh")
    assert(rows(lshBack.searchAllLabeled(q, K, Double.MaxValue,
      ExactNN.Cosine)) ===
      rows(lidx6.searchAllLabeled(q, K, Double.MaxValue, ExactNN.Cosine)))
    livf6.save(spark, s"$dir/ivf")
    val ivfBack = graft.ann.ivf.LabeledIvfIndex.load(spark, s"$dir/ivf")
    assert(rows(ivfBack.searchAllLabeled(q, K, ExactNN.L2)) ===
      rows(livf6.searchAllLabeled(q, K, ExactNN.L2)))
  }

  test("searchAllFiltered: a precomputed decision serves row-identically and skips recomputation") {
    val pred = pmod(($"vec_id" / 10).cast("long"), lit(10)) === 3
    val allowed = corpus.where(pred).select("vec_id")
    val q = corpus.orderBy("vec_id").limit(40)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .localCheckpoint()
    val d = idx.filteredDecision(q, allowed, K, metric = ExactNN.Cosine)
    val reused = idx.searchAllFiltered(q, allowed, K, Double.MaxValue,
      ExactNN.Cosine, decision = Some(d))
    val recomputed = idx.searchAllFiltered(q, allowed, K, Double.MaxValue,
      ExactNN.Cosine)
    assert(rows(reused) === rows(recomputed))
    // the IVF twin
    val dIvf = ivf.filteredDecision(q, allowed, K)
    assert(rows(ivf.searchAllFiltered(q, allowed, K, ExactNN.L2,
      decision = Some(dIvf))) ===
      rows(ivf.searchAllFiltered(q, allowed, K, ExactNN.L2)))
    // a forced decision binds the route (no internal re-derivation)
    val forced = graft.ann.FilteredSearch.Decision(2000L, 200L, None,
      graft.ann.FilteredSearch.ExactSelectivity)
    val exact = ExactNN.topKAgg(q, corpus.where(pred), K, ExactNN.Cosine,
      threshold = Some(Double.MaxValue))
    assert(rows(idx.searchAllFiltered(q, allowed, K, Double.MaxValue,
      ExactNN.Cosine, decision = Some(forced))) === rows(exact))
  }
}
