package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Dedup
import graft.text.Dedup.MinHashConfig
import graft.text.TextFunctions.{shingles, tokens}

/** Text-dedup scale probe — the document-side mirror of ScaleProbe /
  * AngularScaleProbe: replicates the sf0.1 documents corpus K-fold with
  * controlled near-dup planting and planted boilerplate skew, then
  * measures the full near-dup pipeline (MinHash banding with the
  * document-frequency cap, exact-Jaccard verification, connected
  * components) — wall time, planted-pair recall, and the per-key join
  * fan-out the DF cap removes.
  *
  * Corpus construction, per replica r of K (base: 5,000 docs, ~55 tokens):
  *
  *   - every token gets a `~r` suffix, so replicas occupy disjoint
  *     shingle spaces — near-dup structure is exactly (base structure
  *     + plants) × K, and the expected answer is known by construction;
  *   - 30% of docs (base doc_id % 10 < 3) are prefixed with ONE SHARED
  *     un-suffixed 12-token boilerplate sentence — the skew source. Web
  *     boilerplate is global, not replica-local: its shingles reach
  *     document frequency ≈ 0.3 × nDocs no matter how big the corpus
  *     grows, which is exactly the f² hot-key blowup the
  *     `maxDocFreqRatio` cap exists to remove;
  *   - every 50th doc gets a planted near-dup twin (last 10% of tokens
  *     truncated, shingle Jaccard ≈ 0.9) at a known id offset, giving a
  *     ground-truth pair list to score recall against.
  *
  * Reported per K:
  *
  *   - uncapped vs capped shingle stats: max document frequency and
  *     Σ df·(df-1)/2 (the exact row count a shingle-keyed pair join
  *     would produce) — computed from the DF table, NOT by running the
  *     uncapped join, which at K=100 would be ~10¹⁰ rows;
  *   - wall time of `minhashNearDup` (cap on), pair count, planted
  *     recall;
  *   - wall time of `connectedComponents` over the found pairs, cluster
  *     count, and the planted-cluster sanity count.
  *
  * Usage: runMain graft.tools.TextScaleProbe [replicas...]  (default: 10 100)
  */
object TextScaleProbe {

  private val ReplicaStride = 10000000L
  private val PlantOffset = 1000000L
  private val PlantEvery = 50
  private val BoilerplateModulo = 10
  private val BoilerplateHits = 3 // 30% of docs carry the boilerplate
  private val Boilerplate = ("subscribe to our newsletter for updates " +
    "all rights reserved terms of service apply").split(" ").toSeq

  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val cfg = MinHashConfig(shingleN = 3, numHashes = 8, bandRows = 2,
      jaccardThreshold = 0.5, maxDocFreqRatio = 0.1)

    // SPARK_GRAFT_SPARSE_ONLY=1 skips the minhash/cc legs (573 s at
    // K=100) when only the sparse-retrieval block is under study.
    val sparseOnly = sys.env.get("SPARK_GRAFT_SPARSE_ONLY").contains("1")

    for (k <- replicas) {
      val (corpus, plantedPairs) = buildCorpus(spark, base, k)
      val nDocs = corpus.count()
      val nPlanted = plantedPairs.count()

      if (!sparseOnly) reportFanout(corpus, nDocs, cfg)

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }

      if (!sparseOnly) {
      val (pairs, tMinhash) = time {
        val p = Dedup.minhashNearDup(corpus, "doc_id", "text", cfg)
        p.count()
        p
      }
      val nPairs = pairs.count()
      val found = pairs.join(plantedPairs, Seq("doc_a", "doc_b"), "left_semi").count()

      val (clusters, tCc) = time {
        val c = Dedup.connectedComponents(pairs).persist()
        c.count()
        c
      }
      val nClusters = clusters.select("cluster_id").distinct().count()

      println(f"[text-scale] K=$k docs=$nDocs%,d minhash=${tMinhash}%.1fs " +
        f"pairs=$nPairs%,d plantedRecall=${found.toDouble / nPlanted}%.3f " +
        f"(planted=$nPlanted%,d) cc=${tCc}%.1fs clusters=$nClusters%,d")

      // Incremental-maintenance leg (SPARK_GRAFT_INC=1): treat the
      // planted twins as the arrivals batch — base banded once (the
      // stored index), twins band map-side and join it. Headline:
      // incremental wall vs the full recompute above, plus the
      // incremental==full identity checked at corpus scale (full pairs
      // touching an arrival == incremental pairs).
      if (sys.env.get("SPARK_GRAFT_INC").contains("1")) {
        val aIds = plantedPairs.select(col("doc_b").as("doc_id")).persist()
        val arrivalsDf = corpus.join(aIds, Seq("doc_id"), "left_semi")
        val baseDocs = corpus.join(aIds, Seq("doc_id"), "left_anti")
        val (bb, tBand) = time {
          val hot = Dedup.hotShingleRow(baseDocs, "doc_id", "text", cfg)
            .persist()
          val b = Dedup.bandIndex(baseDocs, "doc_id", "text", cfg,
            hot = Some(hot)).persist()
          b.count(); (b, hot)
        }
        val (incPairs, tInc) = time {
          val p = Dedup.minhashNearDupIncremental(bb._1, arrivalsDf,
            "doc_id", "text", cfg, hot = Some(bb._2))
          p.count(); p
        }
        val nInc = incPairs.count()
        val incPlanted = incPairs
          .join(plantedPairs, Seq("doc_a", "doc_b"), "left_semi").count()
        val fullTouching = pairs
          .join(aIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
          .unionByName(pairs
            .join(aIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi"))
          .dropDuplicates("doc_a", "doc_b").persist()
        val nTouch = fullTouching.count()
        val identical = nTouch == nInc &&
          fullTouching.join(incPairs.select("doc_a", "doc_b"),
            Seq("doc_a", "doc_b"), "left_semi").count() == nTouch
        println(f"[text-scale]   incremental: band base=${tBand}%.1fs " +
          f"(once), batch=${arrivalsDf.count()}%,d docs in ${tInc}%.1fs " +
          f"pairs=$nInc%,d plantedRecall=${incPlanted.toDouble / nPlanted}%.3f " +
          f"identity_with_full=$identical (full touching=$nTouch%,d; " +
          f"full recompute was ${tMinhash}%.1fs)")
        fullTouching.unpersist(); aIds.unpersist()
        bb._1.unpersist(); bb._2.unpersist()
      }

      clusters.unpersist(); pairs.unpersist()

      // Span-level duplicate coverage (opt-in SPARK_GRAFT_SPANS=1): the
      // q_dup_span_coverage pipeline at corpus scale — one shuffle on
      // the 60-bit span hash, one doc-keyed re-aggregation; the
      // covered-position explode touches DUPLICATED starts only. The
      // planted truncated twins are exact-prefix copies, so docs with
      // coverage ≥ 0.5 must be ≥ 2 × planted (original + twin) plus the
      // shared-boilerplate carriers once K × 0.3 × base > 1.
      if (sys.env.get("SPARK_GRAFT_SPANS").contains("1")) {
        import graft.text.TextFunctions.hash60
        val spanN = 8
        val (flagged, tSpan) = time {
          val base = corpus
            .select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
          val spans = base
            .select(col("doc_id"), posexplode(shingles(col("toks"), spanN)))
            .select(col("doc_id"), col("pos"), hash60(0, col("col")).as("h"))
          val dupH = spans.groupBy("h")
            .agg(countDistinct(col("doc_id")).as("d"))
            .where(col("d") >= 2).select("h")
          val cov = spans.join(dupH, "h")
            .select(col("doc_id"), col("pos"),
              explode(sequence(col("pos"), col("pos") + lit(spanN - 1))).as("p"))
            .groupBy("doc_id")
            .agg(countDistinct(col("p")).as("covered"))
          val out = base.select(col("doc_id"), col("n_toks"))
            .join(cov, Seq("doc_id"), "left")
            .where(coalesce(col("covered"), lit(0L)).cast("double")
              / col("n_toks") >= 0.5)
          val n = out.count()
          n
        }
        println(f"[text-scale]   spans(n=$spanN): flagged=$flagged%,d " +
          f"docs at coverage>=0.5 in ${tSpan}%.1fs " +
          f"(planted lower bound ${2 * nPlanted}%,d)")
      }
      } // !sparseOnly
      // Sparse-retrieval leg (opt-in SPARK_GRAFT_SPARSE=1): the
      // q_sparse_dot_topk pipeline at corpus scale, query-by-example
      // over the first 10 docs. Replica token suffixes make most query
      // terms replica-local, but the UNSUFFIXED shared boilerplate (on
      // 30% of ALL docs) is the realistic stopword-like fan-out: its
      // postings join 0.3 x corpus rows per boilerplate query term.
      // Measured twice — unpruned, and with minWeight=1.0 posting
      // pruning (ln(N/df) -> 0 as df -> 0.3N, so boilerplate postings
      // sit near weight 0 and pruning removes exactly the fan-out).
      if (sys.env.get("SPARK_GRAFT_SPARSE").contains("1")) {
        val d = corpus.select(col("doc_id"), tokens(col("text")).as("toks"))
        def sparseRun(minW: Double): (Long, Double) = time {
          val qsel = d.where(col("doc_id") < 10)
            .select(explode(col("toks")).as("term")).distinct()
          val w = graft.queries.RetrievalQueries.sparseWeights(
            d, Some(qsel), minWeight = minW)
          val qw = w.where(col("doc_id") < 10)
            .select(col("doc_id").as("query_id"), col("term"),
              col("w").as("qw"))
          val scored = w.join(broadcast(qw), "term")
            .where(col("doc_id") =!= col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(round(sum(col("qw") * col("w")), 6).as("score"))
          scored.groupBy("query_id")
            .agg(graft.ann.TopK.topK(10)(col("doc_id"), -col("score")).as("nn"))
            .select(col("query_id"), explode(col("nn")))
            .count()
        }
        val (n0, t0) = sparseRun(0.0)
        val (n1, t1) = sparseRun(1.0)
        println(f"[text-scale]   sparse: unpruned $t0%.1fs ($n0 rows), " +
          f"minWeight=1.0 $t1%.1fs ($n1 rows)")
        // Stored-index serving (round 12): build the PostingsStore once,
        // then serve the same query-by-example batch from the persisted
        // table — the rebuild-per-call vs probe-the-index split the
        // serving swap exists for. Serve is measured twice (cold file
        // read, then page-cached) to separate I/O from plan cost.
        val pPath = java.nio.file.Files
          .createTempDirectory("text_scale_postings").toString + "/idx"
        val (_, tBuild) = time {
          graft.retrieval.PostingsStore.build(spark, pPath, d); 0L
        }
        val store = new graft.retrieval.PostingsStore(spark, pPath, 1000)
        def serveRun(): (Long, Double) = time {
          val w = store.sparse
          val qw = w.where(col("doc_id") < 10)
            .select(col("doc_id").as("query_id"), col("term"),
              col("w").as("qw"))
          val scored = w.join(broadcast(qw), "term")
            .where(col("doc_id") =!= col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(round(sum(col("qw") * col("w")), 6).as("score"))
          scored.groupBy("query_id")
            .agg(graft.ann.TopK.topK(10)(col("doc_id"), -col("score")).as("nn"))
            .select(col("query_id"), explode(col("nn")))
            .count()
        }
        val (ns1, ts1) = serveRun()
        val (ns2, ts2) = serveRun()
        println(f"[text-scale]   postings store: build $tBuild%.1fs, " +
          f"serve $ts1%.1fs cold / $ts2%.1fs warm ($ns1/$ns2 rows)")
        // Merge-refit at corpus scale (round 13): drift 1k docs (half
        // arrivals with a fresh OOV-suffixed vocabulary, half deletes)
        // into the store, then fold the stats with mergeRefit — the
        // O(drift) remedy — vs the O(corpus) full rebuild it replaces.
        // Row-identity of the two is spec-pinned (PostingsStoreSpec);
        // this measures the cost split the design exists for.
        val nC = corpus.count()
        val arrivals = d.where(col("doc_id") < 500)
          .select((col("doc_id") + lit(2L * nC)).as("doc_id"),
            transform(col("toks"),
              t => concat(t, lit("~oov"))).as("toks"))
        val deletes = d.where(col("doc_id") >= 500 && col("doc_id") < 1000)
          .select("doc_id")
        val (_, tBatch) = time { store.onBatch(Some(arrivals), Some(deletes)); 0L }
        val (_, tRefit) = time { store.mergeRefit(); 0L }
        val (_, tRebuild) = time {
          val rbPath = java.nio.file.Files
            .createTempDirectory("text_scale_rebuild").toString + "/idx"
          graft.retrieval.PostingsStore.build(spark, rbPath,
            d.where(col("doc_id") >= 1000 || col("doc_id") < 500)
              .unionByName(arrivals))
          0L
        }
        println(f"[text-scale]   stats refit: onBatch(1k drift) $tBatch%.1fs, " +
          f"mergeRefit $tRefit%.1fs vs full rebuild $tRebuild%.1fs")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }

  /** K replicas (disjoint shingle spaces) + shared boilerplate on 30% of
    * docs + a truncated near-dup twin for every 50th doc. Returns the
    * (doc_id, text) corpus and the planted (doc_a, doc_b) ground truth. */
  private def buildCorpus(spark: SparkSession, base: DataFrame,
                          k: Int): (DataFrame, DataFrame) = {
    val bp = array(Boilerplate.map(lit): _*)
    val replicated = spark.range(k).withColumnRenamed("id", "r")
      .crossJoin(base)
      .select(col("r"), col("doc_id").as("base_id"),
        (col("r") * ReplicaStride + col("doc_id")).as("doc_id"),
        concat(
          when(col("doc_id") % BoilerplateModulo < BoilerplateHits, bp)
            .otherwise(array().cast("array<string>")),
          transform(col("toks"),
            t => concat(t, lit("~"), col("r").cast("string")))).as("toks"))
    val planted = replicated
      .where(col("base_id") % PlantEvery === 0)
      .select(col("r"), col("base_id"),
        (col("doc_id") + PlantOffset).as("doc_id"),
        slice(col("toks"), lit(1),
          ceil(size(col("toks")) * 0.9).cast("int")).as("toks"))
    val corpus = replicated.select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
      .union(planted.select(col("doc_id"), concat_ws(" ", col("toks")).as("text")))
      .persist()
    val plantedPairs = planted
      .select((col("doc_id") - PlantOffset).as("doc_a"), col("doc_id").as("doc_b"))
      .persist()
    (corpus, plantedPairs)
  }

  /** Shingle document-frequency skew, capped vs uncapped: max df and
    * Σ df·(df-1)/2 — the row count a shingle-keyed pair join would emit.
    * Derived from the DF table only; the uncapped join itself is never
    * run (at K=100 it would be ~10^10 rows). */
  private def reportFanout(corpus: DataFrame, nDocs: Long,
                           cfg: MinHashConfig): Unit = {
    val df = corpus
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("toks"), cfg.shingleN))).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .persist()
    val stats = df.agg(
      max("df").as("max_df"),
      sum(col("df") * (col("df") - 1) / 2).as("join_rows")).head()
    val capped = df.where(col("df") <= cfg.maxDocFreqRatio * nDocs)
    val cStats = capped.agg(
      max("df").as("max_df"),
      sum(col("df") * (col("df") - 1) / 2).as("join_rows")).head()
    val dropped = df.count() - capped.count()
    println(f"[text-scale]   fanout uncapped: maxDf=${stats.getLong(0)}%,d " +
      f"joinRows=${stats.getDouble(1)}%,.0f | capped(ratio=${cfg.maxDocFreqRatio}): " +
      f"maxDf=${cStats.getLong(0)}%,d joinRows=${cStats.getDouble(1)}%,.0f " +
      f"(dropped $dropped hot shingles)")
    df.unpersist()
  }
}
