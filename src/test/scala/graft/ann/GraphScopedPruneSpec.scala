package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** The scoped refine's bucket-pruned scan form
  * ([[GraphMaintainer.scopePruneMax]]): when the touched region fits
  * under the cap, the region ids are collected (bounded) and every
  * edge-table pass — hop expansions, the reverse-hop seed scan, the
  * touched slices — becomes an InSet filter on the base table's `src`
  * bucket column, which Spark's scan planner turns into bucket pruning
  * (SelectedBucketsCount < nBuckets). Contracts under test:
  *
  *   - the MECHANISM: an InSet `src` filter over the served view
  *     bucket-prunes the base scan (the executed plan says so);
  *   - IDENTITY: pruned refine == fallback refine, row for row — same
  *     served view, same supersede records, same replacement rows —
  *     including a mid-loop overflow (a cap the first hop outgrows),
  *     which must redo the hop in the semi-join form, not serve a
  *     truncated region;
  *   - the dispatch is observable ([[GraphMaintainer.lastScopedPrune]])
  *     so probes can attribute timings to the right path.
  */
class GraphScopedPruneSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkClustered(n: Int, seed: Int = 23) = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val c = (i % 3).toInt
      val centre = Seq.tabulate(8)(j =>
        new scala.util.Random(c * 97 + j).nextGaussian() * 8)
      (i, centre.map(_ + rng.nextGaussian() * 0.3))
    }
  }

  private def freshTable(name: String): Unit =
    GraphSearch.dropManagedTables(spark,
      s"${name}_edges", s"${name}_swap_edges")

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("src", "dst").as[(Long, Long)].collect().toSet

  private val existing = mkClustered(150)
  private val arriving = (300L until 316L).map { i =>
    val rngA = new scala.util.Random(i * 7 + 1)
    val centre = Seq.tabulate(8)(j =>
      new scala.util.Random(((i % 3) * 97 + j).toInt).nextGaussian() * 8)
    (i, centre.map(_ + rngA.nextGaussian() * 0.3))
  }
  private val dead = Seq(1L, 4L, 28L)

  /** Build a fresh store + maintainer at the given prune cap, run one
    * insert+delete batch and the scoped refine, and return the
    * maintainer with its LSM root (for direct log reads). */
  private def runOne(name: String, pruneMax: Int): (GraphMaintainer, String) = {
    val existDf = existing.toDF("vec_id", "embedding")
    val all = (existing ++ arriving).toDF("vec_id", "embedding")
    freshTable(name)
    val base = KnnGraph.exact(existDf, "vec_id", "embedding", 4, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(existDf, "vec_id"))
      .dropDuplicates("src", "dst")
    GraphSearch.saveBucketed(base, name)
    val lsm = java.nio.file.Files
      .createTempDirectory(s"${name}_lsm").toString
    val m = new GraphMaintainer(spark, name, lsm,
      "vec_id", "embedding", k = 4, beamWidth = 8, hops = 3,
      refineEvery = 100, maxReverseDegree = 3,
      scopedRefine = true, scopeHops = 2, scopePruneMax = pruneMax,
      // force the size dispatch open — spec tables are far below the
      // production threshold
      scopePruneMinBytes = 0L)
    val newDf = arriving.toDF("vec_id", "embedding")
    val entries = newDf.select($"vec_id".as("query_id"))
      .crossJoin((0L until 8L).toDF("node"))
    m.onBatch(all, newDf, entries, Some(dead.toDF("vec_id")))
    m.refineScopedNow(all)
    (m, lsm)
  }

  test("an InSet src filter over the served view bucket-prunes the base scan") {
    // Two layers of evidence, because the planner's
    // DisableUnnecessaryBucketedScan rule may print the scan as
    // "Bucketed: false" while createReadRDD still applies the bucket
    // FILE filter (pruning is gated on bucketing.enabled, not on the
    // bucketed-scan output partitioning):
    //   1. the numFiles metric — the ground truth: the InSet form must
    //      READ fewer files than the semi-join form on the same table;
    //   2. with auto-bucketed-scan disabled, the plan itself accounts
    //      the pruning (SelectedBucketsCount < nBuckets).
    // (The default-conf path is also pinned in Spark's own source:
    // FileSourceScanExec.createReadRDD's shouldProcess filter applies
    // the optionalBucketSet whenever bucketingEnabled, independent of
    // the disabled bucketed-scan OUTPUT partitioning — layer 1 below
    // measures exactly that.)
    val (m, _) = runOne("prune_plan", GraphMaintainer.DefaultScopePruneMax)
    val ids = (0L until 10L).toIndexedSeq
    def bytesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        df.collect()
        // the listener bus is async — poll until the count is stable
        var last = -1L
        var stable = 0
        var waited = 0
        while (stable < 3 && waited < 100) {
          Thread.sleep(100); waited += 1
          val now = acc.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val pruned = bytesRead(
      m.servingEdges.where(col("src").isInCollection(ids)))
    val unpruned = bytesRead(
      m.servingEdges.join(broadcast(ids.toDF("src")), Seq("src"),
        "left_semi"))
    assert(pruned < (unpruned * 0.7).toLong,
      s"InSet form read $pruned bytes vs semi-join's $unpruned — no file pruning")
    // layer 2: keep the bucketed scan and read the plan's own account
    val prevAuto = spark.conf.getOption(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val sliced = m.servingEdges.where(col("src").isInCollection(ids))
      sliced.collect()
      val plan = sliced.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val hit = sel.findFirstMatchIn(plan)
      assert(hit.isDefined, s"no SelectedBucketsCount in:\n$plan")
      assert(hit.get.group(1).toInt < hit.get.group(2).toInt,
        s"expected a pruned bucketed scan, got ${hit.get.matched}")
    } finally prevAuto match {
      // restore the PRE-TEST value, not a hardcoded default — a session
      // running with a non-default conf must leave this test unchanged
      case Some(v) => spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    }
  }

  test("pruned refine == fallback refine, row for row (and the dispatch is observable)") {
    val (pruned, prunedLsm) = runOne("prune_on", GraphMaintainer.DefaultScopePruneMax)
    val (fallback, fallbackLsm) = runOne("prune_off", 0)
    assert(pruned.lastScopedPrune.contains(true),
      "default cap must take the pruned path on a small region")
    assert(fallback.lastScopedPrune.contains(false),
      "cap 0 must take the semi-join path")
    assert(edgeSet(pruned.servingEdges) === edgeSet(fallback.servingEdges))
    def logRows(lsm: String, sub: String, cols: Seq[String]) =
      spark.read.parquet(s"$lsm/$sub")
        .select(cols.map(col): _*).collect().toSet
    assert(logRows(prunedLsm, "superseded", Seq("src", "seq")) ===
      logRows(fallbackLsm, "superseded", Seq("src", "seq")))
    assert(logRows(prunedLsm, "edges_delta", Seq("src", "dst", "seq")) ===
      logRows(fallbackLsm, "edges_delta", Seq("src", "dst", "seq")))
  }

  test("a mid-loop overflow falls back without truncating the region") {
    // cap = 4: the seed set (16 arrivals + 3 deletes + in-neighbors)
    // already outgrows it, so every pass runs the semi-join form
    val (tiny, _) = runOne("prune_tiny", 4)
    val (fallback, _) = runOne("prune_off2", 0)
    assert(tiny.lastScopedPrune.contains(false))
    assert(edgeSet(tiny.servingEdges) === edgeSet(fallback.servingEdges))
    // cap = 40: seeds fit, the 2-hop expansion overflows mid-loop —
    // the refine must redo that hop semi-join-style on the complete
    // prior region (a truncated region would drop supersede records)
    val (mid, _) = runOne("prune_mid", 40)
    assert(mid.lastScopedPrune.contains(false))
    assert(edgeSet(mid.servingEdges) === edgeSet(fallback.servingEdges))
  }
}
