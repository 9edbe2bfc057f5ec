package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{CodesMaintainer, ExactNN, GraphMaintainer, GraphSearch,
  KnnGraph}
import graft.ann.lsh.{Lsh, LshConfig}
import graft.retrieval.PostingsStore
import graft.streaming.IngestPipeline
import graft.text.{Dedup, DedupGate}

/** The composed ingestion lifecycle at store scale — the measurement
  * behind [[graft.streaming.IngestPipeline]]'s 100 TB story: the
  * gate-scale oracle row (`q_ingest_composed`) certifies correctness
  * on 500 docs; this measures what a deployment cares about — the
  * per-micro-batch wall cost of ONE arrivals batch flowing through
  * dedup-gate → postings → codes → graph against stores built over an
  * n-doc corpus, and whether that cost is batch-bounded (flat across
  * consecutive batches) rather than corpus-bounded.
  *
  * Corpus: deterministic 12-token docs (tokens hash-derived per id —
  * shingleable, near-unique) over [[ProbeGen.clustered]] embeddings.
  * Each batch is `b` arrivals: 10% exact near-dups of stored docs
  * (the gate must reject them), 90% fresh (admitted), plus b/20
  * deletes of stored ids — the mixed shape a real pipeline sees.
  *
  * Usage: runMain graft.tools.IngestScaleProbe [n] [batch] [batches]
  * [compactEvery] [drift] [labeled] (default: 1000000 1000 3 1000 0 0
  * — pass a
  * small compactEvery to measure per-batch cost ACROSS a
  * compaction/fold boundary: every flat store compacts and the graph
  * folds at that cadence, so e.g. compactEvery=2 over 4 batches pays
  * two compaction cycles inside the composed loop; drift=1 shifts
  * every batch after the first +8.0 per coordinate (~4 fit-MADs on the
  * ProbeGen.clustered geometry) so the codes leg's drift check
  * breaches twice, flips refitDue, and the probe times the
  * refitAndSwap the breach gates — the round-17 measurement: the
  * composed drift-refit firing INSIDE the pipeline at corpus scale,
  * with membership asserted preserved across the swap; labeled=1 adds
  * the SIXTH leg — the label-partitioned store over the same trained
  * forest, pricing the composed batch with constrained serving
  * maintained in the same loop)
  */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toLong else 1000000L
    val b = if (args.length > 1) args(1).toLong else 1000L
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val compactEvery = if (args.length > 3) args(3).toInt else 1000
    val withDrift = args.length > 4 && args(4) == "1"
    val withLabeled = args.length > 5 && args(5) == "1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import spark.implicits._

    // deterministic 12-token text per id; ~50k-word vocabulary keeps
    // shingles near-unique so only the planted copies near-dup
    def withText(ids: DataFrame): DataFrame = ids
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(11)), i =>
          concat(lit("w"), pmod(xxhash64(col("vec_id"), i), lit(50000))))))
      .withColumn("toks", split(col("text"), " "))

    val corpus = withText(ProbeGen.clustered(spark, n)).persist()
    corpus.count()
    val cfg = Dedup.MinHashConfig(shingleN = 3, numHashes = 8,
      bandRows = 2, jaccardThreshold = 0.5, maxDocFreqRatio = 1.0)

    def timed[T](f: => T): (T, Double) = ProbeGen.timed(f)

    // ---- store builds over the n-doc corpus ----
    val root = java.nio.file.Files
      .createTempDirectory("ingest_probe").toString
    val base = corpus.select(col("vec_id").as("doc_id"), col("text"),
      col("toks"), col("embedding"))
    val (gate, tGate) = timed {
      DedupGate.build(spark, s"$root/gate", base, cfg = cfg,
        compactEvery = compactEvery)
    }
    val (postings, tPost) = timed {
      PostingsStore.build(spark, s"$root/postings",
        base.select(col("doc_id"), col("toks")),
        compactEvery = compactEvery)
    }
    val (codesAndSq, tCodes) = timed {
      val sq = graft.ann.sq.Sq.train(corpus, "vec_id", "embedding")
      sq.save(spark, s"$root/codes")
      val drift =
        if (!withDrift) None
        else {
          graft.ann.DriftCheck.writeFitStats(
            corpus.select(col("vec_id"), col("embedding")),
            s"$root/codes_fit_stats")
          Some(new graft.ann.DriftCheck(spark, s"$root/codes_fit_stats",
            shiftWatermark = 3.0, ratioWatermark = 100.0))
        }
      (new CodesMaintainer(spark, s"$root/codes",
        encode = a => sq.model.transformDf(a, "vec_id", "embedding"),
        compactEvery = compactEvery, driftCheck = drift,
        refitAfterBreaches = 2), sq)
    }
    val codes = codesAndSq._1
    GraphSearch.dropManagedTables(spark,
      "ingest_probe_edges", "ingest_probe_swap_edges")
    val (graphAndIdx, tGraph) = timed {
      val ix = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
      val g = KnnGraph.fromLsh(ix, corpus, "vec_id", "embedding", 8,
          ExactNN.Cosine, maxBucketOccupancy = 50)
        .select(col("src"), col("dst"))
        .unionByName(GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst")
      GraphSearch.saveBucketed(g, "ingest_probe")
      (new GraphMaintainer(spark, "ingest_probe", s"$root/graph",
        "vec_id", "embedding", k = 8, beamWidth = 32, hops = 4,
        refineEvery = 1000, maxReverseDegree = 2,
        compactEvery = compactEvery), ix)
    }
    val graph = graphAndIdx._1
    // fifth leg: the serving LSH forest, maintained on the same
    // admitted set — REUSES the graph's already-trained forest (same
    // frozen model the deployment serves hybrid retrieval from)
    val (forest, tForest) = timed {
      graphAndIdx._2.save(spark, s"$root/forest")
      new graft.ann.lsh.LshMaintainer(spark, s"$root/forest",
        compactEvery = compactEvery)
    }
    // sixth leg (labeled=1): the label-partitioned store over the SAME
    // trained forest, label = vec_id % 10 (geometry-correlated on the
    // replica recipe — the constrained-serving shape)
    val labeledOpt =
      if (!withLabeled) None
      else {
        val (m, tLab) = timed {
          graphAndIdx._2.withLabels(corpus.select(col("vec_id"),
              pmod(col("vec_id"), lit(10)).cast("string").as("label")))
            .save(spark, s"$root/labeled")
          new graft.ann.lsh.LabeledLshMaintainer(spark, s"$root/labeled",
            compactEvery = compactEvery)
        }
        println(f"[ingest-scale] labeled store build: $tLab%.1fs")
        Some(m)
      }
    println(f"[ingest-scale] n=$n%,d compactEvery=$compactEvery store " +
      f"builds: gate $tGate%.1fs, postings $tPost%.1fs, codes " +
      f"$tCodes%.1fs, graph $tGraph%.1fs, forest $tForest%.1fs")

    val pipeline = new IngestPipeline(gate, postings, codes, graph,
      entriesFor = nv => nv.select(col("vec_id").as("query_id"))
        .crossJoin((0L until 32L).toDF("node")),
      lsh = Some(forest), labeledLsh = labeledOpt)

    // ---- composed micro-batches ----
    // batch k: fresh ids n + k*b ..; 10% of the batch reuses a STORED
    // id's text (guaranteed near-dup, must be rejected); b/20 deletes
    var liveVecs = corpus.select(col("vec_id"), col("embedding"))
    for (k <- 0 until nBatches) {
      val lo = n + k * b
      val fresh0 = ProbeGen.clustered(spark, lo + b).where(col("vec_id") >= lo)
      // drift mode: batches after the first arrive ~4 fit-MADs shifted
      // — the sustained-distribution-change the breach counter gates on
      val fresh =
        if (withDrift && k >= 1)
          fresh0.select(col("vec_id"),
            transform(col("embedding"), x => x + lit(8.0)).as("embedding"))
        else fresh0
      val arrivals = withText(fresh.select(col("vec_id")))
        // the dup tail: the last 10% of the batch carries the text of
        // stored doc (vec_id mod n) — an exact copy the gate must catch
        .withColumn("text",
          when(col("vec_id") >= lo + (b * 9) / 10,
            concat_ws(" ", transform(sequence(lit(0), lit(11)), i =>
              concat(lit("w"),
                pmod(xxhash64(pmod(col("vec_id"), lit(n)), i), lit(50000))))))
            .otherwise(col("text")))
        .withColumn("toks", split(col("text"), " "))
        .join(fresh.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("vec_id").as("doc_id"), col("text"), col("toks"),
          col("embedding"),
          pmod(col("vec_id"), lit(10)).cast("string").as("label"))
      val deletes = (0 until (b / 20).toInt)
        .map(i => (k * 1000L + i * 37L) % n).distinct.toDF("doc_id")
      val vectors = liveVecs.unionByName(
        arrivals.select(col("doc_id").as("vec_id"), col("embedding")))
      val (report, tBatch) = timed {
        pipeline.onBatch(arrivals, vectors, Some(deletes))
      }
      println(f"[ingest-scale] batch ${k + 1}: ${report.arrived}%,d " +
        f"arrivals -> ${report.admitted}%,d admitted " +
        f"(${report.arrived - report.admitted}%,d rejected), " +
        f"${deletes.count()}%,d deletes: $tBatch%.1fs" +
        codes.lastDrift.fold("")(d =>
          f" | drift shift=${d._1}%.1f fold=${d._2}%.2f " +
            s"refitDue=${codes.refitDue}"))
      liveVecs = vectors.join(
        broadcast(report.rejected.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_anti")
      // the breach-gated refit, fired INSIDE the composed loop: retrain
      // the quantizer on the live corpus, swap atomically, verify the
      // stored membership is untouched — the operator action the
      // refitDue poll exists for, priced at corpus scale
      if (withDrift && codes.refitDue) {
        val before = codes.liveCodes.count()
        val (_, tRefit) = timed {
          val live = liveVecs
            .join(codes.liveCodes.select("vec_id"), Seq("vec_id"),
              "left_semi")
          val sq2 = graft.ann.sq.Sq.train(live, "vec_id", "embedding")
          graft.ann.DriftCheck.writeFitStats(
            live.select(col("vec_id"), col("embedding")),
            s"$root/codes_fit_stats")
          codes.refitAndSwap(liveVecs,
            a => sq2.model.transformDf(a, "vec_id", "embedding"),
            writeModel = p => sq2.model.save(spark, p),
            modelSubs = Seq("bounds", "meta"))
        }
        val after = codes.liveCodes.count()
        println(f"[ingest-scale] refitAndSwap after batch ${k + 1}: " +
          f"$tRefit%.1fs over $after%,d live codes " +
          s"(membership preserved: ${before == after}, " +
          s"refitDue reset: ${!codes.refitDue})")
      }
    }
    spark.stop()
  }
}
