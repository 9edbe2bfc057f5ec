package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** [[GraphMaintainer.refineScopedNow]] — the touched-region refine.
  * Contracts under test:
  *
  *   - the bucketed BASE table is physically untouched (a scoped refine
  *     writes logs, never rewrites the table);
  *   - served rows of srcs beyond the region boundary are EXACTLY what
  *     they were before the refine;
  *   - window deletes are consolidated locally (no served edge touches
  *     a tombstoned id; in-neighbors bridged);
  *   - the directed refined slice respects the k out-degree invariant;
  *   - arrivals remain served after the refine, and a reconstructed
  *     maintainer agrees (scope fence + seq are persistent);
  *   - the scheduled scoped refine re-bounds a reverse-link hub (the
  *     degree-restore duty it takes over from [[GraphMaintainer
  *     .refineNow]]) without the full-table rewrite.
  */
class GraphScopedRefineSpec extends AnyFunSuite with SparkSpecBase {

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

  test("scoped refine: base untouched, far rows identical, deletes consolidated, k-cut holds") {
    val existing = mkClustered(120)
    val arriving = (200L until 212L).map { i =>
      // arrivals near cluster 0's centre
      val rngA = new scala.util.Random(i * 7 + 1)
      val centre = Seq.tabulate(8)(j =>
        new scala.util.Random(j).nextGaussian() * 8)
      (i, centre.map(_ + rngA.nextGaussian() * 0.3))
    }
    val all = (existing ++ arriving).toDF("vec_id", "embedding")
    val existDf = existing.toDF("vec_id", "embedding")
    freshTable("scoped_spec")
    val base = KnnGraph.exact(existDf, "vec_id", "embedding", 4, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(existDf, "vec_id"))
      .dropDuplicates("src", "dst")
    GraphSearch.saveBucketed(base, "scoped_spec")
    val lsm = java.nio.file.Files.createTempDirectory("scoped_lsm").toString
    val m = new GraphMaintainer(spark, "scoped_spec", lsm,
      "vec_id", "embedding", k = 4, beamWidth = 8, hops = 3,
      refineEvery = 100, maxReverseDegree = 3,
      scopedRefine = true, scopeHops = 1)

    // one batch: 12 inserts near cluster 0, 2 deletes in cluster 1
    val newDf = arriving.toDF("vec_id", "embedding")
    val dead = Seq(1L, 4L) // cluster-1 ids (1 % 3 == 1, 4 % 3 == 1)
    val entries = newDf.select($"vec_id".as("query_id"))
      .crossJoin((0L until 8L).toDF("node"))
    m.onBatch(all, newDf, entries, Some(dead.toDF("vec_id")))

    val baseBefore = edgeSet(GraphSearch.loadBucketed(spark, "scoped_spec"))
    val servedBefore = edgeSet(m.servingEdges)
    // independently derive the region the refine may touch: seeds =
    // arrivals + deletes + the deletes' in-neighbors (the explicit
    // reverse hop — consolidation must reach them even on an
    // asymmetric graph), one hop over the served graph
    val deadSet = dead.toSet
    val intoDead = servedBefore.collect { case (s, d) if deadSet(d) => s }
    val seeds = arriving.map(_._1).toSet ++ deadSet ++ intoDead
    val hop1 = servedBefore.collect { case (s, d) if seeds(s) => d }
    val region = seeds ++ hop1

    val refined = m.refineScopedNow(all)
    refined.count()

    // (a) the bucketed base table is PHYSICALLY untouched
    assert(edgeSet(GraphSearch.loadBucketed(spark, "scoped_spec")) ===
      baseBefore, "scoped refine rewrote the base table")

    val servedAfter = edgeSet(m.servingEdges)
    // (b) beyond the boundary (region srcs' post-refine dsts), served
    // rows are EXACTLY the pre-refine rows
    val boundary = servedAfter.collect { case (s, d) if region(s) => d }
    val mayChange = region ++ boundary
    val farBefore = servedBefore.filterNot { case (s, _) => mayChange(s) }
    val farAfter = servedAfter.filterNot { case (s, _) => mayChange(s) }
    assert(farAfter === farBefore,
      "rows outside the touched region changed")

    // (c) deletes consolidated: no served edge touches a dead id
    dead.foreach { id =>
      assert(!servedAfter.exists { case (s, d) => s == id || d == id },
        s"dead node $id still has served edges")
    }

    // (d) the directed refined slice holds the k-cut
    val maxOut = refined.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).as[Long].head()
    assert(maxOut <= 4, s"refined out-degree $maxOut exceeds k")

    // (e) arrivals still served: each finds itself at dist 0
    val q = arriving.take(4).toDF("query_id", "qv")
    val served = GraphSearch.beamFrom(m.servingEdges, all, "vec_id",
        "embedding", q,
        q.select($"query_id").crossJoin((0L until 16L).toDF("node")),
        1, 16, 4, symmetrize = false)
      .as[(Long, Long, Double)].collect()
    served.foreach { case (qid, vid, dist) =>
      assert(vid === qid && dist === 0.0, s"node $qid not served: ($vid, $dist)")
    }

    // (f) a reconstructed maintainer agrees (fence + seq persistent):
    // no drift since the refine, so its next scoped refine is a no-op
    val m2 = new GraphMaintainer(spark, "scoped_spec", lsm,
      "vec_id", "embedding", k = 4, beamWidth = 8, hops = 3,
      refineEvery = 100, maxReverseDegree = 3,
      scopedRefine = true, scopeHops = 1)
    assert(m2.batchesSeen === 2, s"seq: ${m2.batchesSeen}")
    assert(edgeSet(m2.servingEdges) === servedAfter)
    m2.refineScopedNow(all).count()
    assert(edgeSet(m2.servingEdges) === servedAfter,
      "a no-drift scoped refine changed the served graph")
    // the no-drift refine burned seq 3 with NO log rows (its only trace
    // is the scope fence) — a reconstructed maintainer must not reuse
    // it, or the next window's arrivals would sit at the fence and be
    // skipped by every future scoped refine
    val m3 = new GraphMaintainer(spark, "scoped_spec", lsm,
      "vec_id", "embedding", k = 4, beamWidth = 8, hops = 3,
      refineEvery = 100, maxReverseDegree = 3,
      scopedRefine = true, scopeHops = 1)
    assert(m3.batchesSeen === 3,
      s"burned empty-refine seq reused after restart: ${m3.batchesSeen}")
  }

  test("scheduled scoped refine re-bounds the insert hub without a table rewrite") {
    // the GraphMaintenanceSpec magnet geometry, scoped mode: arrivals
    // pile reverse links onto an existing magnet node; the scheduled
    // SCOPED refine must re-bound it (the magnet is 1 hop from every
    // arrival), while the base table stays byte-identical
    val rng = new scala.util.Random(13)
    val magnet = Array.fill(8)(rng.nextGaussian())
    val existing = (0L until 60L).map { i =>
      if (i == 7L) (i, magnet.toSeq)
      else (i, Seq.fill(8)(rng.nextGaussian()).map(_ * 3.0))
    }
    val arriving = (60L until 84L).map { i =>
      (i, magnet.indices.map(d =>
        magnet(d) + (if (d == 0) 0.5 else 0.0) + rng.nextGaussian() * 0.01).toSeq)
    }
    val all = (existing ++ arriving).toDF("vec_id", "embedding")
    val existDf = existing.toDF("vec_id", "embedding")
    freshTable("scoped_hub_spec")
    val base = KnnGraph.exact(existDf, "vec_id", "embedding", 4, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(existDf, "vec_id"))
      .dropDuplicates("src", "dst")
    GraphSearch.saveBucketed(base, "scoped_hub_spec")
    val m = new GraphMaintainer(spark, "scoped_hub_spec",
      java.nio.file.Files.createTempDirectory("scoped_hub_lsm").toString,
      "vec_id", "embedding", k = 4, beamWidth = 8, hops = 3,
      refineEvery = 4, maxReverseDegree = 3,
      scopedRefine = true, scopeHops = 1)
    def hubDegree: Long =
      m.servingEdges.where($"src" === 7L).count()
    val baseRows = edgeSet(GraphSearch.loadBucketed(spark, "scoped_hub_spec"))
    var hubBeforeRefine = 0L
    arriving.grouped(6).zipWithIndex.foreach { case (split, i) =>
      if (i == 3) {
        hubBeforeRefine = hubDegree
        assert(m.refineDue, "4th batch must trigger the scoped refine")
      }
      val batchDf = split.toDF("vec_id", "embedding")
      val entries = batchDf.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node"))
      m.onBatch(all, batchDf, entries)
    }
    assert(m.batchesSeen === 5, s"seq: ${m.batchesSeen}") // 4 batches + refine
    assert(hubBeforeRefine > 10,
      s"magnet accumulation did not materialize ($hubBeforeRefine)")
    val hubAfter = hubDegree
    assert(hubAfter < hubBeforeRefine,
      s"scoped refine did not shrink the hub ($hubBeforeRefine -> $hubAfter)")
    // the rewrite-free contract: the base table bytes never moved
    assert(edgeSet(GraphSearch.loadBucketed(spark, "scoped_hub_spec")) ===
      baseRows, "scoped mode rewrote the base table")
  }
}
