package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.{CodesMaintainer, ExactNN, GraphMaintainer, GraphSearch,
  KnnGraph}
import graft.retrieval.PostingsStore
import graft.text.{Dedup, DedupGate}

/** The composed ingestion lifecycle ([[IngestPipeline]]): ONE arrivals
  * micro-batch flowing through dedup-gate → postings append → codes
  * append → graph insert from the same foreachBatch. Contracts:
  *
  *   - stream == batch identity ACROSS ALL FIVE STORES: the streaming
  *     run's final store states (band index, postings, codes, LSH
  *     forest, graph edges) are row-identical to a driver-side loop
  *     applying the same splits sequentially;
  *   - one consistency cut: every admitted doc is in all five stores,
  *     every rejected doc in none;
  *   - gate semantics across batches: a batch-2 arrival duplicating a
  *     batch-1 ADMISSION is rejected (the stored band index grew), a
  *     same-batch delete unblocks a near-identical arrival (upsert);
  *   - deletes fan out: a deleted doc leaves postings/codes/bands and
  *     is tombstoned in the graph.
  */
class StreamingIngestPipelineSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val cfg = Dedup.MinHashConfig(shingleN = 3, numHashes = 8,
    bandRows = 2, jaccardThreshold = 0.5, maxDocFreqRatio = 1.0)

  private def baseText(i: Long) =
    s"base doc $i carries tokens t${i}a t${i}b t${i}c t${i}d"

  private val rng = new scala.util.Random(29L)
  private val vecs: Map[Long, Seq[Double]] =
    ((0L until 40L) ++ Seq(100L, 101L, 102L, 103L, 110L, 111L, 112L))
      .map(i => i -> Seq.fill(8)(rng.nextGaussian())).toMap

  // batch rows: (doc_id, text, op) — op 'del' rows are deletes
  private val batch1: Seq[(Long, String, String)] = Seq(
    (100L, baseText(5), "ins"),               // dup of stored 5 -> rejected
    (101L, "fresh arrival alpha one two three four five six", "ins"),
    (102L, "fresh arrival alpha one two three four five six", "ins"),
    (103L, "unique arrival beta seven eight nine ten eleven", "ins"))
  private val batch2: Seq[(Long, String, String)] = Seq(
    (110L, "fresh arrival alpha one two three four five six", "ins"),
    (111L, "unique arrival gamma twelve thirteen fourteen fifteen", "ins"),
    (112L, baseText(7), "ins"),                // 7 deleted SAME batch -> admitted
    (7L, "", "del"))

  private def baseDocs: DataFrame =
    (0L until 40L).map(i => (i, baseText(i), vecs(i)))
      .toDF("doc_id", "text", "embedding")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("label", pmod(col("doc_id"), lit(3)).cast("string"))

  // the pipeline's `vectors` contract: live corpus (base ∪ admitted so
  // far) ∪ the CURRENT batch's arrivals — prior batches' rejections
  // never enter the union (a scheduled refine would backbone them back
  // into the graph otherwise; IngestPipeline scaladoc)
  private def vectorsFor(admittedSoFar: Seq[Long],
                         current: Seq[(Long, String, String)]): DataFrame =
    ((0L until 40L) ++ admittedSoFar ++
        current.filter(_._3 == "ins").map(_._1))
      .distinct.sorted.map(i => (i, vecs(i)))
      .toDF("vec_id", "embedding")

  private def arrivalsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.filter(_._3 == "ins")
      .map { case (i, t, _) => (i, t, vecs(i)) }
      .toDF("doc_id", "text", "embedding")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("label", pmod(col("doc_id"), lit(3)).cast("string"))

  private def deletesDf(rows: Seq[(Long, String, String)]): Option[DataFrame] = {
    val d = rows.filter(_._3 == "del").map(_._1)
    if (d.isEmpty) None else Some(d.toDF("doc_id"))
  }

  /** Build the six stores fresh under `tag` and return the pipeline
    * plus handles to each store. */
  private def buildStores(tag: String)
      : (IngestPipeline, DedupGate, PostingsStore, CodesMaintainer,
         GraphMaintainer, graft.ann.lsh.LshMaintainer,
         graft.ann.lsh.LabeledLshMaintainer) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"ingest_$tag").toString
    val gate = DedupGate.build(spark, s"$root/gate", baseDocs,
      cfg = cfg, compactEvery = 100)
    val postings = PostingsStore.build(spark, s"$root/postings",
      baseDocs.select($"doc_id", $"toks"), compactEvery = 100)
    val baseVecs = baseDocs.select($"doc_id".as("vec_id"), $"embedding")
    val sq = graft.ann.sq.Sq.train(baseVecs, "vec_id", "embedding")
    sq.save(spark, s"$root/codes")
    val codes = new CodesMaintainer(spark, s"$root/codes",
      encode = a => sq.model.transformDf(a, "vec_id", "embedding"),
      compactEvery = 100)
    val lshIdx = graft.ann.lsh.Lsh.train(baseVecs, "vec_id", "embedding",
      graft.ann.lsh.LshConfig(nTrees = 3, kMinVecs = 8, seed = 7L))
    lshIdx.save(spark, s"$root/forest")
    val forest = new graft.ann.lsh.LshMaintainer(spark, s"$root/forest",
      compactEvery = 100)
    // the labeled store: the SAME fitted forest re-keyed by the docs'
    // label column (the withLabels contract), maintained as the
    // pipeline's sixth leg
    lshIdx.withLabels(baseDocs.select($"doc_id".as("vec_id"), $"label"))
      .save(spark, s"$root/labeled")
    val labeled = new graft.ann.lsh.LabeledLshMaintainer(spark,
      s"$root/labeled", compactEvery = 100)
    val name = s"ingest_${tag}_graph"
    GraphSearch.dropManagedTables(spark, s"${name}_edges",
      s"${name}_swap_edges")
    val g = KnnGraph.exact(baseVecs, "vec_id", "embedding", 3,
        ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(baseVecs, "vec_id"))
      .dropDuplicates("src", "dst")
    GraphSearch.saveBucketed(g, name)
    val graph = new GraphMaintainer(spark, name, s"$root/graph",
      "vec_id", "embedding", k = 3, beamWidth = 8, hops = 2,
      refineEvery = 100, maxReverseDegree = 2)
    val pipeline = new IngestPipeline(gate, postings, codes, graph,
      entriesFor = nv => nv.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node")),
      lsh = Some(forest), labeledLsh = Some(labeled))
    (pipeline, gate, postings, codes, graph, forest, labeled)
  }

  /** Labeled-store membership: composite rows (vec_id, label, tree_id,
    * hash) of the serving view, with vectors/buckets agreement asserted
    * (the forestSet rule on the composite key). */
  private def labeledSet(m: graft.ann.lsh.LabeledLshMaintainer)
      : Set[(Long, String, Int, Long)] = {
    val idx = m.index
    val vecIds = idx.vectors.select($"vec_id").as[Long].collect().toSet
    val rows = idx.labeledBuckets
      .select($"vec_id", $"label", $"tree_id", $"hash")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(rows.map(_._1) === vecIds,
      "labeled vectors and buckets disagree on membership")
    rows
  }

  /** Forest membership + bucket rows (vec_id, tree_id, hash) of the
    * serving LSH view — both tables must agree store-wide, so the set
    * carries the bucket rows, not just ids. */
  private def forestSet(m: graft.ann.lsh.LshMaintainer)
      : Set[(Long, Int, Long)] = {
    val idx = m.index
    val vecIds = idx.vectors.select($"vec_id").as[Long].collect().toSet
    val rows = idx.buckets.select($"vec_id", $"tree_id", $"hash")
      .as[(Long, Int, Long)].collect().toSet
    assert(rows.map(_._1) === vecIds,
      "forest vectors and buckets disagree on membership")
    rows
  }

  private def bandsSet(g: DedupGate): Set[(Long, Int, String)] =
    g.servingBands.select($"doc_id", $"band", $"bkey")
      .as[(Long, Int, String)].collect().toSet

  // membership via liveDocs (a new doc's terms can be all-OOV until a
  // stats refit, so `sparse` under-reports by design); the scored view
  // compared too, so the weights' stream==batch identity stays pinned
  private def postingsSet(p: PostingsStore): Set[(Long, Long)] =
    p.liveDocs.select($"doc_id", $"dl".cast("long"))
      .as[(Long, Long)].collect().toSet

  private def sparseSet(p: PostingsStore): Set[(Long, String, Double)] =
    p.sparse.select($"doc_id", $"term", round($"w", 6))
      .as[(Long, String, Double)].collect().toSet

  private def codesSet(c: CodesMaintainer): Set[(Long, Seq[Int])] =
    c.liveCodes.select($"vec_id", $"codes".cast("array<int>"))
      .as[(Long, Seq[Int])].collect().toSet

  private def edgesSet(g: GraphMaintainer): Set[(Long, Long)] =
    g.servingEdges.select($"src", $"dst")
      .as[(Long, Long)].collect().toSet

  test("one micro-batch drives all six stores; stream == batch; rejected in none, admitted in all") {
    // ---- streaming side ----
    val (sp, sGate, sPost, sCodes, sGraph, sForest, sLab) = buildStores("s")
    val reports = scala.collection.mutable.ListBuffer
      .empty[IngestPipeline.Report]
    val sAdmitted = scala.collection.mutable.ListBuffer.empty[Long]
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "text", "op")
      .writeStream
      .foreachBatch { (batchDf: DataFrame, _: Long) =>
        if (!batchDf.isEmpty) {
          val rows = batchDf.select($"doc_id", $"text", $"op")
            .as[(Long, String, String)].collect().toSeq
          val rep = sp.onBatch(arrivalsDf(rows),
            vectorsFor(sAdmitted.toSeq, rows), deletesDf(rows))
          reports += rep
          sAdmitted ++= rep.admittedRows.select($"doc_id")
            .as[Long].collect()
        }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // ---- batch twin: same splits, sequential ----
    val (bp, bGate, bPost, bCodes, bGraph, bForest, bLab) = buildStores("b")
    val bAdmitted = scala.collection.mutable.ListBuffer.empty[Long]
    val bReports = Seq(batch1, batch2).map { rows =>
      val rep = bp.onBatch(arrivalsDf(rows),
        vectorsFor(bAdmitted.toSeq, rows), deletesDf(rows))
      bAdmitted ++= rep.admittedRows.select($"doc_id").as[Long].collect()
      rep
    }

    // stream == batch, store for store
    assert(bandsSet(sGate) === bandsSet(bGate), "band index diverged")
    assert(postingsSet(sPost) === postingsSet(bPost), "postings diverged")
    assert(sparseSet(sPost) === sparseSet(bPost), "sparse weights diverged")
    assert(codesSet(sCodes) === codesSet(bCodes), "codes diverged")
    assert(edgesSet(sGraph) === edgesSet(bGraph), "graph diverged")
    assert(forestSet(sForest) === forestSet(bForest), "LSH forest diverged")
    assert(labeledSet(sLab) === labeledSet(bLab), "labeled store diverged")

    // gate semantics: batch 1 rejects the stored-dup and the
    // within-batch higher id; batch 2 rejects the dup of batch 1's
    // ADMISSION and admits the same-batch-delete upsert
    val rej1 = reports(0).rejected.as[(Long, Long)].collect().toMap
    assert(rej1.keySet === Set(100L, 102L), s"batch-1 rejects: $rej1")
    assert(rej1(100L) === 5L && rej1(102L) === 101L)
    assert(reports(0).admitted === 2L && reports(0).arrived === 4L)
    val rej2 = reports(1).rejected.as[(Long, Long)].collect().toMap
    assert(rej2.keySet === Set(110L), s"batch-2 rejects: $rej2")
    assert(rej2(110L) === 101L,
      "batch-2 dup not caught against batch-1's stored admission")
    assert(reports(1).admitted === 2L)
    // the batch twin decided identically
    assert(bReports(0).rejected.as[(Long, Long)].collect().toMap === rej1)
    assert(bReports(1).rejected.as[(Long, Long)].collect().toMap === rej2)

    // the consistency cut: admitted ids in ALL stores, rejected in NONE
    val admitted = Set(101L, 103L, 111L, 112L)
    val rejected = Set(100L, 102L, 110L)
    val inBands = bandsSet(sGate).map(_._1)
    val inPost = postingsSet(sPost).map(_._1)
    val inCodes = codesSet(sCodes).map(_._1)
    val inGraph = edgesSet(sGraph).map(_._1)
    val inForest = forestSet(sForest).map(_._1)
    val labRows = labeledSet(sLab)
    val inLabeled = labRows.map(_._1)
    admitted.foreach { id =>
      assert(inBands(id), s"admitted $id missing from band index")
      assert(inPost(id), s"admitted $id missing from postings")
      assert(inCodes(id), s"admitted $id missing from codes")
      assert(inGraph(id), s"admitted $id missing from graph")
      assert(inForest(id), s"admitted $id missing from the LSH forest")
      assert(inLabeled(id), s"admitted $id missing from the labeled store")
      // and it landed in ITS label's partition only
      assert(labRows.filter(_._1 == id).map(_._2) === Set((id % 3).toString),
        s"admitted $id in the wrong label partition")
    }
    rejected.foreach { id =>
      assert(!inBands(id) && !inPost(id) && !inCodes(id) && !inGraph(id)
          && !inForest(id) && !inLabeled(id),
        s"rejected $id leaked into a store")
    }

    // deletes fanned out: doc 7 left postings/codes/bands/forest/
    // labeled and is tombstoned in the graph (served-excluded until
    // the next refine)
    assert(!inBands(7L) && !inPost(7L) && !inCodes(7L) && !inForest(7L)
        && !inLabeled(7L),
      "deleted doc 7 still serving")
    assert(sGraph.tombstones.as[Long].collect().contains(7L),
      "deleted doc 7 not tombstoned in the graph")

    // and a rejected doc really was a verified near-dup of its anchor
    // (jaccard >= threshold against the canonical doc's text)
    val pairs = Dedup.minhashNearDup(
      Seq((100L, baseText(5)), (5L, baseText(5))).toDF("doc_id", "text"),
      "doc_id", "text", cfg)
    assert(pairs.where($"jac" >= cfg.jaccardThreshold).count() === 1L)
  }

  test("at-least-once replay converges: re-applying a batch changes no flat-store view") {
    // the crash-replay contract: a stream checkpoint re-delivers a
    // batch whose stores already applied it; the composed end state
    // must equal the once-applied state. The gate re-admits (an id
    // never pairs against itself), and the pipeline's upsert-deletes
    // make the replayed postings/codes rows SUPERSEDE the originals
    // instead of double-serving them.
    val (p, gate, post, codes, graph, forest, lab) = buildStores("r")
    val rows1 = batch1
    p.onBatch(arrivalsDf(rows1), vectorsFor(Nil, rows1), deletesDf(rows1))
    val postOnce = postingsSet(post)
    val sparseOnce = sparseSet(post)
    val codesOnce = codesSet(codes)
    val forestOnce = forestSet(forest)
    val labeledOnce = labeledSet(lab)
    val bandsOnce = bandsSet(gate)
    // replay the SAME batch (fresh seq, same rows)
    val rep2 = p.onBatch(arrivalsDf(rows1), vectorsFor(Nil, rows1),
      deletesDf(rows1))
    assert(rep2.admitted === 2L, "replayed arrivals must re-admit")
    assert(postingsSet(post) === postOnce, "postings diverged on replay")
    assert(sparseSet(post) === sparseOnce, "sparse weights diverged on replay")
    assert(codesSet(codes) === codesOnce, "codes diverged on replay")
    assert(forestSet(forest) === forestOnce, "LSH forest diverged on replay")
    assert(labeledSet(lab) === labeledOnce, "labeled store diverged on replay")
    // the band index may briefly hold duplicate rows pre-compaction;
    // the candidate-facing SET is unchanged, and compaction collapses
    // the physical duplicates
    assert(bandsSet(gate) === bandsOnce, "band key set diverged on replay")
    gate.compactNow()
    assert(bandsSet(gate) === bandsOnce)
    val physical = gate.servingBands.count()
    assert(physical === gate.servingBands
      .dropDuplicates("doc_id", "band", "bkey").count(),
      "compaction left physical duplicate band rows")
    // graph: the replayed insert's delta anti-joins rows it would
    // duplicate — no duplicate edges, and the admitted ids still serve
    val edges = edgesSet(graph)
    assert(edges.size === graph.servingEdges.count(),
      "duplicate edges after replay")
    assert(Set(101L, 103L).subsetOf(edges.map(_._1)))
  }

  test("DedupGate.build freezes the corpus hot list: capped base and arrivals band identically") {
    // every doc shares a boilerplate prefix whose pure-boilerplate
    // shingles are hot at ratio 0.5 (df = 100%). The gate must cap
    // ARRIVALS with the same frozen hot list the stored index was
    // built with: a base capped one way and arrivals banded raw put
    // different shingle sets under the signatures, so an identical
    // arrival would miss every band key and slip through admitted.
    val boiler = "terms of service apply to this document"
    val docs = (0L until 30L).map(i =>
        (i, s"$boiler unique body u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("gate_hot").toString
    val gate = DedupGate.build(spark, s"$root/gate", docs,
      cfg = cfg.copy(maxDocFreqRatio = 0.5), compactEvery = 100)
    val arrival = Seq((100L, s"$boiler unique body u5a u5b u5c u5d"))
      .toDF("doc_id", "text")
    val res = gate.onBatch(arrival)
    assert(res.admitted.isEmpty,
      "near-dup of a stored doc admitted under hot capping")
    assert(res.rejected.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap === Map(100L -> 5L))

    // crash recovery: a gate REOPENED from the path alone (driver
    // restart — no hot frame in hand) must recover the persisted
    // fit-time hot list and keep banding arrivals with the stored
    // index's geometry; before the $path/hot artifact it silently
    // constructed uncapped and this near-dup slipped through admitted
    val reopened = new DedupGate(spark, s"$root/gate",
      cfg.copy(maxDocFreqRatio = 0.5))
    val res2 = reopened.onBatch(
      Seq((200L, s"$boiler unique body u9a u9b u9c u9d"))
        .toDF("doc_id", "text"))
    assert(res2.admitted.isEmpty,
      "reopened capped gate lost the frozen hot list and admitted a " +
        "near-dup of a stored doc")
    assert(res2.rejected.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap === Map(200L -> 9L))

    // a capped gate over a path with no persisted artifact fails LOUDLY
    // at construction instead of banding with the wrong geometry
    val bare = java.nio.file.Files
      .createTempDirectory("gate_hot_bare").toString
    val ex = intercept[IllegalStateException] {
      new DedupGate(spark, s"$bare/gate", cfg.copy(maxDocFreqRatio = 0.5))
    }
    assert(ex.getMessage.contains("hot"))

    // migration (DedupGate.adoptHot): a store persisted BEFORE the
    // artifact existed — simulated by deleting $path/hot — recovers by
    // recomputing the hot row from the fit-time corpus; with the
    // matching corpus the adopted gate bands identically to the fresh
    // build (same df-threshold cut over the same docs = same set)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/gate/hot"), true)
    intercept[IllegalStateException] {
      new DedupGate(spark, s"$root/gate", cfg.copy(maxDocFreqRatio = 0.5))
    }
    val migrated = DedupGate.adoptHot(spark, s"$root/gate", docs,
      cfg = cfg.copy(maxDocFreqRatio = 0.5))
    val res3 = migrated.onBatch(
      Seq((300L, s"$boiler unique body u7a u7b u7c u7d"))
        .toDF("doc_id", "text"))
    assert(res3.admitted.isEmpty,
      "migrated gate banded with different geometry and admitted a " +
        "near-dup of a stored doc")
    assert(res3.rejected.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap === Map(300L -> 7L))
  }
}
