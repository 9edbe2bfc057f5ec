package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.{ExactNN, GraphMaintainer, GraphSearch, KnnGraph}

/** Graph-index DELETES on a stream — the delete twin of
  * StreamingGraphInsertSpec: each micro-batch carries arrivals AND
  * tombstones, driven through GraphMaintainer.onBatch inside
  * foreachBatch (tombstone log, link-avoidance on insert, scheduled
  * consolidation with the FreshDiskANN bridge rule). The identity under
  * test: the stored bucketed graph and the tombstone log after the
  * streaming loop — INCLUDING a consolidation triggered mid-stream by
  * the refine cadence — are identical to a driver-side batch loop
  * applying the same (arrivals, deletes) splits through an identically
  * configured maintainer. The streaming machinery adds and loses
  * nothing; deleted ids are gone from the store and never served. */
class StreamingGraphDeleteSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def cleanTables(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"target/spark-warehouse/$t")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("foreachBatch deletes+inserts+consolidation == sequential batch loop") {
    val rng = new scala.util.Random(23)
    def pt(center: Double) =
      Seq.tabulate(8)(i => center + (if (i == 0) 0.0 else rng.nextGaussian() * 0.05))
    // 40 existing nodes in two clusters + 4 arrivals (2 per batch)
    val existingRows = (0L until 20L).map(i => (i, pt(0.0))) ++
      (20L until 40L).map(i => (i, pt(10.0)))
    val arrivalRows = Seq(40L -> pt(0.2), 41L -> pt(9.8),
      42L -> pt(0.4), 43L -> pt(9.6))
    val existing = existingRows.toDF("vec_id", "embedding")
    val corpus = (existingRows ++ arrivalRows).toDF("vec_id", "embedding")

    // batch 1: arrivals 40,41; delete 3, 27.  batch 2 (triggers the
    // refineEvery=2 consolidation): arrivals 42,43; delete 11. Arrival
    // vectors reuse arrivalRows so both sides see identical embeddings.
    val batchDefs = Seq(
      (arrivalRows.take(2), Seq(3L, 27L)),
      (arrivalRows.drop(2), Seq(11L)))

    def mkMaintainer(name: String) = new GraphMaintainer(spark, name,
      java.nio.file.Files.createTempDirectory(s"${name}_lsm").toString,
      "vec_id", "embedding", k = 4, beamWidth = 12, hops = 4,
      refineEvery = 2, maxReverseDegree = 2, backbone = false,
      metric = ExactNN.L2)

    def seed(name: String): Unit = {
      cleanTables(s"${name}_edges", s"${name}_tombstones")
      val base = KnnGraph.exact(existing, "vec_id", "embedding", 4, ExactNN.L2)
        .select($"src", $"dst")
      GraphSearch.saveBucketed(base, name)
    }

    def entriesFor(arr: org.apache.spark.sql.DataFrame) =
      arr.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node"))

    // batch twin
    seed("gsdel_batch")
    val mb = mkMaintainer("gsdel_batch")
    for ((arr, dels) <- batchDefs) {
      val a = arr.toDF("vec_id", "embedding")
      mb.onBatch(corpus, a, entriesFor(a), deletes = Some(dels.toDF("vec_id")))
    }

    // streaming twin: (vec_id, embedding, del) rows through foreachBatch
    seed("gsdel_stream")
    val ms = mkMaintainer("gsdel_stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double], Boolean)]
    val q = mem.toDF().toDF("vec_id", "embedding", "del")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batchDf.isEmpty) {
          val a = batchDf.where(!$"del").select($"vec_id", $"embedding")
          val d = batchDf.where($"del").select($"vec_id")
          ms.onBatch(corpus, a, entriesFor(a), deletes = Some(d))
        }
        ()
      }
      .start()
    try {
      for ((arr, dels) <- batchDefs) {
        mem.addData(arr.map { case (id, e) => (id, e, false) } ++
          dels.map(id => (id, Seq.empty[Double], true)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // identity: stored graph + tombstone log
    val eb = GraphSearch.loadBucketed(spark, "gsdel_batch")
      .as[(Long, Long)].collect().toSet
    val es = GraphSearch.loadBucketed(spark, "gsdel_stream")
      .as[(Long, Long)].collect().toSet
    assert(es === eb,
      s"streamed graph diverged: ${es.size} vs ${eb.size} edges")
    assert(mb.tombstones.as[Long].collect().toSet ===
      ms.tombstones.as[Long].collect().toSet)

    // batch-2's consolidation folded batch-1's AND batch-2's tombstones
    // into the store: no edge touches any deleted id, log is empty
    assert(ms.batchesSeen === 2 && mb.batchesSeen === 2)
    assert(ms.tombstones.isEmpty, "tombstone log survived consolidation")
    val deadIds = Seq(3L, 27L, 11L)
    assert(GraphSearch.loadBucketed(spark, "gsdel_stream")
      .where($"src".isin(deadIds: _*) || $"dst".isin(deadIds: _*))
      .count() === 0, "deleted ids survive in the streamed store")

    // the maintained graph serves arrivals and never a deleted id
    val stored = GraphSearch.loadBucketed(spark, "gsdel_stream")
    val qv = Seq((42L, arrivalRows(2)._2)).toDF("query_id", "qv")
    val served = GraphSearch.beamFrom(stored, corpus, "vec_id", "embedding",
        qv, qv.select($"query_id").crossJoin((0L until 8L).toDF("node")),
        3, 12, 5, metric = ExactNN.L2, symmetrize = false)
      .as[(Long, Long, Double)].collect()
    assert(served.exists(r => r._2 == 42L && r._3 == 0.0),
      s"arrival not served: ${served.toSeq}")
    assert(!served.exists(r => deadIds.contains(r._2)),
      s"deleted id served: ${served.toSeq}")
  }

  test("SCOPED store: foreachBatch == sequential batch loop, base never rewritten") {
    // the scoped-refine twin of the test above: deltas land in the
    // seq-stamped edges_delta log, the mid-stream cadence triggers
    // refineScopedNow (supersede + replacement rows, NOT a table
    // rewrite), and the streamed store's SERVED graph is identical to
    // the driver-side batch loop's — while both base tables stay
    // byte-identical to the seed (the rewrite-free contract).
    val rng = new scala.util.Random(23)
    def pt(center: Double) =
      Seq.tabulate(8)(i => center + (if (i == 0) 0.0 else rng.nextGaussian() * 0.05))
    val existingRows = (0L until 20L).map(i => (i, pt(0.0))) ++
      (20L until 40L).map(i => (i, pt(10.0)))
    val arrivalRows = Seq(40L -> pt(0.2), 41L -> pt(9.8),
      42L -> pt(0.4), 43L -> pt(9.6))
    val existing = existingRows.toDF("vec_id", "embedding")
    val corpus = (existingRows ++ arrivalRows).toDF("vec_id", "embedding")
    val batchDefs = Seq(
      (arrivalRows.take(2), Seq(3L, 27L)),
      (arrivalRows.drop(2), Seq(11L)))

    def mkMaintainer(name: String) = new GraphMaintainer(spark, name,
      java.nio.file.Files.createTempDirectory(s"${name}_lsm").toString,
      "vec_id", "embedding", k = 4, beamWidth = 12, hops = 4,
      refineEvery = 2, maxReverseDegree = 2, backbone = false,
      metric = ExactNN.L2, scopedRefine = true, scopeHops = 1)

    def seed(name: String): Unit = {
      cleanTables(s"${name}_edges", s"${name}_tombstones")
      val base = KnnGraph.exact(existing, "vec_id", "embedding", 4, ExactNN.L2)
        .select($"src", $"dst")
      GraphSearch.saveBucketed(base, name)
    }
    def entriesFor(arr: org.apache.spark.sql.DataFrame) =
      arr.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node"))

    seed("gsco_batch")
    val baseRows = GraphSearch.loadBucketed(spark, "gsco_batch")
      .as[(Long, Long)].collect().toSet
    val mb = mkMaintainer("gsco_batch")
    for ((arr, dels) <- batchDefs) {
      val a = arr.toDF("vec_id", "embedding")
      mb.onBatch(corpus, a, entriesFor(a), deletes = Some(dels.toDF("vec_id")))
    }

    seed("gsco_stream")
    val ms = mkMaintainer("gsco_stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double], Boolean)]
    val q = mem.toDF().toDF("vec_id", "embedding", "del")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batchDf.isEmpty) {
          val a = batchDf.where(!$"del").select($"vec_id", $"embedding")
          val d = batchDf.where($"del").select($"vec_id")
          ms.onBatch(corpus, a, entriesFor(a), deletes = Some(d))
        }
        ()
      }
      .start()
    try {
      for ((arr, dels) <- batchDefs) {
        mem.addData(arr.map { case (id, e) => (id, e, false) } ++
          dels.map(id => (id, Seq.empty[Double], true)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // 2 batches + the burned scoped-refine seq
    assert(mb.batchesSeen === 3 && ms.batchesSeen === 3)
    // served identity (the scoped store's serving view, not the table)
    val sb = mb.servingEdges.as[(Long, Long)].collect().toSet
    val ss = ms.servingEdges.as[(Long, Long)].collect().toSet
    assert(ss === sb,
      s"streamed scoped graph diverged: ${ss.size} vs ${sb.size} edges")
    // the rewrite-free contract on BOTH sides: base tables untouched
    assert(GraphSearch.loadBucketed(spark, "gsco_batch")
      .as[(Long, Long)].collect().toSet === baseRows)
    assert(GraphSearch.loadBucketed(spark, "gsco_stream")
      .as[(Long, Long)].collect().toSet === baseRows)
    // the scoped refine consolidated the window's deletes locally:
    // nothing served touches them (tombstones stay ACTIVE as exclusions
    // until a full refine — unlike the full-refine twin's empty log)
    val deadIds = Seq(3L, 27L, 11L)
    assert(!ss.exists { case (s, d) =>
      deadIds.contains(s) || deadIds.contains(d) },
      "deleted ids survive in the scoped served graph")
    assert(ms.tombstones.as[Long].collect().toSet === deadIds.toSet,
      "scoped tombstones dropped before a full refine")
    // serves arrivals, never a deleted id
    val qv = Seq((42L, arrivalRows(2)._2)).toDF("query_id", "qv")
    val served = GraphSearch.beamFrom(ms.servingEdges, corpus, "vec_id",
        "embedding", qv,
        qv.select($"query_id").crossJoin((0L until 8L).toDF("node")),
        3, 12, 5, metric = ExactNN.L2, symmetrize = false)
      .as[(Long, Long, Double)].collect()
    assert(served.exists(r => r._2 == 42L && r._3 == 0.0),
      s"arrival not served: ${served.toSeq}")
    assert(!served.exists(r => deadIds.contains(r._2)),
      s"deleted id served: ${served.toSeq}")
  }

  test("SCOPED store: a mid-stream FOLD keeps stream == batch (logs dropped, base rewritten)") {
    // the fold twin of the scoped test above: compactEvery = 3 makes
    // batch 2's scheduled scoped refine (seq 3) immediately due for
    // the log fold — the streamed store must land exactly where the
    // driver-side batch loop lands THROUGH the fold: identical
    // rewritten base (now == the served view, tombstones applied
    // physically), logs dropped, serving unchanged.
    val rng = new scala.util.Random(23)
    def pt(center: Double) =
      Seq.tabulate(8)(i => center + (if (i == 0) 0.0 else rng.nextGaussian() * 0.05))
    val existingRows = (0L until 20L).map(i => (i, pt(0.0))) ++
      (20L until 40L).map(i => (i, pt(10.0)))
    val arrivalRows = Seq(40L -> pt(0.2), 41L -> pt(9.8),
      42L -> pt(0.4), 43L -> pt(9.6))
    val existing = existingRows.toDF("vec_id", "embedding")
    val corpus = (existingRows ++ arrivalRows).toDF("vec_id", "embedding")
    val batchDefs = Seq(
      (arrivalRows.take(2), Seq(3L, 27L)),
      (arrivalRows.drop(2), Seq(11L)))

    def mkMaintainer(name: String) = new GraphMaintainer(spark, name,
      java.nio.file.Files.createTempDirectory(s"${name}_lsm").toString,
      "vec_id", "embedding", k = 4, beamWidth = 12, hops = 4,
      refineEvery = 2, maxReverseDegree = 2, backbone = false,
      metric = ExactNN.L2, scopedRefine = true, scopeHops = 1,
      compactEvery = 3)

    def seed(name: String): Unit = {
      cleanTables(s"${name}_edges", s"${name}_tombstones",
        s"${name}_swap_edges")
      val base = KnnGraph.exact(existing, "vec_id", "embedding", 4, ExactNN.L2)
        .select($"src", $"dst")
      GraphSearch.saveBucketed(base, name)
    }
    def entriesFor(arr: org.apache.spark.sql.DataFrame) =
      arr.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node"))

    seed("gsfold_batch")
    val baseRows = GraphSearch.loadBucketed(spark, "gsfold_batch")
      .as[(Long, Long)].collect().toSet
    val mb = mkMaintainer("gsfold_batch")
    for ((arr, dels) <- batchDefs) {
      val a = arr.toDF("vec_id", "embedding")
      mb.onBatch(corpus, a, entriesFor(a), deletes = Some(dels.toDF("vec_id")))
    }

    seed("gsfold_stream")
    val ms = mkMaintainer("gsfold_stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double], Boolean)]
    val q = mem.toDF().toDF("vec_id", "embedding", "del")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batchDf.isEmpty) {
          val a = batchDf.where(!$"del").select($"vec_id", $"embedding")
          val d = batchDf.where($"del").select($"vec_id")
          ms.onBatch(corpus, a, entriesFor(a), deletes = Some(d))
        }
        ()
      }
      .start()
    try {
      for ((arr, dels) <- batchDefs) {
        mem.addData(arr.map { case (id, e) => (id, e, false) } ++
          dels.map(id => (id, Seq.empty[Double], true)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // 2 batches + the burned scoped-refine seq; the fold burns none
    assert(mb.batchesSeen === 3 && ms.batchesSeen === 3)
    // the fold RAN on both sides: base rewritten, logs dropped,
    // tombstones physically applied
    val bb = GraphSearch.loadBucketed(spark, "gsfold_batch")
      .as[(Long, Long)].collect().toSet
    val bs = GraphSearch.loadBucketed(spark, "gsfold_stream")
      .as[(Long, Long)].collect().toSet
    assert(bb !== baseRows, "the mid-stream fold never rewrote the base")
    assert(bs === bb, s"streamed folded base diverged: ${bs.size} vs ${bb.size}")
    assert(mb.tombstones.isEmpty && ms.tombstones.isEmpty,
      "tombstones survived the fold")
    // fold == served-view identity on both sides
    assert(mb.servingEdges.as[(Long, Long)].collect().toSet === bb)
    assert(ms.servingEdges.as[(Long, Long)].collect().toSet === bs)
    val deadIds = Seq(3L, 27L, 11L)
    assert(!bs.exists { case (s, d) =>
      deadIds.contains(s) || deadIds.contains(d) },
      "deleted ids survive the fold")
    // serving through the folded store
    val qv = Seq((42L, arrivalRows(2)._2)).toDF("query_id", "qv")
    val served = GraphSearch.beamFrom(ms.servingEdges, corpus, "vec_id",
        "embedding", qv,
        qv.select($"query_id").crossJoin((0L until 8L).toDF("node")),
        3, 12, 5, metric = ExactNN.L2, symmetrize = false)
      .as[(Long, Long, Double)].collect()
    assert(served.exists(r => r._2 == 42L && r._3 == 0.0),
      s"arrival not served post-fold: ${served.toSeq}")
  }
}
