package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.text.TextFunctions._

/** Text-analysis + deduplication operators over `documents.parquet`
  * (doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars
  * BIGINT) — the LLM-training-data-pipeline surface (SURVEY.md §7.5).
  *
  * Every query here is deterministic, UDF-free (whole-stage codegen'd
  * built-ins only) and carries a DuckDB oracle. The shared cross-engine
  * hash is md5-derived (see [[graft.text.TextFunctions]]).
  *
  * Scale design (100 TB): the near-dup pipelines never materialize
  * all-pairs. MinHash banding shuffles on (band, band_key) so only
  * bucket-colliding docs meet; the n-gram pair join shuffles on the
  * shingle value (a 100 TB run would additionally drop ultra-frequent
  * shingles — stopword-shingle skew — before the join); SimHash pairs are
  * the one quadratic verifier, bounded here to the doc count of the test
  * tables (the scale path is banding the simhash prefix exactly like
  * MinHash). Per-doc projections (tokens, quality, fingerprints,
  * signatures) are pure map-side work.
  */
object TextQueries extends QueryPack {

  val ShingleN = 3
  val ChunkLen = 16
  val ChunkStride = 12
  val NumHashes = 8 // MinHash signature length
  val BandRows = 2  // rows per LSH band -> 4 bands
  val JaccardThreshold = 0.5
  val HammingThreshold = 8
  /** n-gram length for train/benchmark decontamination — long enough
    * that a shared shingle means copied text, not chance collision
    * (the published pipelines use 8-13-gram windows on web-scale text;
    * 5 fits this corpus's short synthetic docs). */
  val ContamN = 5
  /** Drop shingles present in more than this fraction of documents
    * before the n-gram pair join — a shingle shared by f docs
    * contributes f² join rows, so document-frequency capping is the
    * skew guard that keeps the shingle-keyed shuffle flat on
    * boilerplate-heavy corpora (mirrored in the DuckDB oracle). */
  val NgramMaxDocFreqRatio = 0.5
  val Stopwords = Seq("a", "the", "and", "of", "to", "in", "is")
  /** BPE-ish pre-tokenizer: letter runs, digit runs, or single
    * non-alphanumeric glyphs (RE2- and Java-regex compatible). */
  val BpeTokenRegex = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"""
  /** Top terms kept per language in the TF-IDF query. */
  val TfIdfTopK = 5
  /** Repetition-quality keep thresholds (Gopher-style, Rae et al. 2021
    * arXiv:2112.11446 §A1.1): calibrated to this corpus's decile spread
    * (unique_ratio deciles .32–.75, top_tok_frac .07–.14) so both keep
    * classes are non-trivially populated. */
  val RepMinUniqueRatio = 0.45
  val RepMaxTopTokFrac = 0.10
  /** Per-source-index keep rates for the training-mixture sampler
    * (source "srcN" → rate MixtureRates(N % 4)). */
  val MixtureRates = Seq(1.0, 0.5, 0.25, 0.1)
  /** Context-window token budget for the concatenate-and-chop packer. */
  val PackWindow = 64

  /** Training-shard count for `q_training_shards`. */
  val NumShards = 16
  /** CCNet-style unigram-LM keep threshold on per-doc mean NLL (keep
    * the low-perplexity head, Wenzek et al. 2020 arXiv:1911.00359
    * §4.3): calibrated to this corpus's avg-NLL decile spread
    * (p10 3.396 – p90 3.410) so both keep classes are populated. */
  val PplMaxAvgNll = 3.405

  /** Bigram interpolation weight (λ on the bigram term) and the keep
    * threshold for `q_bigram_ppl` (measured at sf0.01 so the flag
    * splits non-trivially, like [[PplMaxAvgNll]]). */
  val BigramLambda = 0.75
  val BigramMaxAvgNll = 3.48

  /** Vocabulary head size for the `q_zipf_fit` regression. */
  val ZipfHead = 200

  /** Per-source token budget for `q_token_budget` — sized to BIND for
    * the large sources at sf0.01 and not the small ones, so the query
    * exercises both sides of the cut. */
  val TokenBudget = 1300L
  /** Span length for exact-substring duplicate coverage (Lee et al. 2022
    * arXiv:2107.06499 use 50-token spans on web text; 8 fits this
    * corpus's 10-100-token synthetic docs — long enough that a shared
    * span means planted duplication, not chance: measured 1,015 of
    * 22,579 distinct 8-spans are cross-doc at sf0.01, and coverage is
    * bimodal 0 vs 0.92-1.0). */
  val SpanN = 8
  /** Drop a doc when more than this fraction of its tokens sit inside a
    * span shared with another document. */
  val DupCoverageMax = 0.5
  /** Sensitive-term lexicon for the scrubbing pass. Real pipelines pair
    * regex detectors (emails, IPs) with a lexicon; this corpus is
    * synthetic word-salad, so the regex detectors exercise the
    * zero-match path while the lexicon (terms chosen to intersect the
    * vocab) exercises real replacement. */
  val PiiLexicon = Seq("customer", "user", "key", "value")
  val EmailRegex = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  /** DSIR keep threshold on the per-doc mean log importance ratio
    * (Xie et al. 2023 arXiv:2302.03169; target domain = the `en`
    * slice). 0.0 = "looks more like the target than the raw mixture";
    * calibrated: en docs median +0.0007, other langs negative, so both
    * keep classes are populated. */
  val DsirMinAvgLogRatio = 0.0
  /** PageRank over the n-gram similarity graph: fixed power iterations
    * (deterministic, hence oracle-unrollable) with standard damping.
    * The edge threshold sits far below the near-dup one: at 0.5 the
    * pair graph is 2-cliques (uniform PR); at 0.02 the sf0.01 corpus
    * yields 333 nodes / 312 edges with degrees 1-8. */
  val PrIters = 5
  val PrDamping = 0.85
  val PrJaccardThreshold = 0.02
  val EnMarkers = Seq("the", "a", "of", "and")
  val DeMarkers = Seq("der", "die", "das", "und")
  val FrMarkers = Seq("le", "la", "les", "et")

  private def docs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        tokens(col("text")).as("toks"))

  /** (doc_id, hash_id, sig): MinHash signatures in exploded-row form,
    * DERIVED from the same per-row signature construction the dedup
    * pipeline uses ([[graft.text.Dedup.minhashSigFromHashes]] over the
    * chained tokens → shingles → hashes projections) — one source of
    * truth for the hash family, so a hash-family edit cannot split the
    * two forms. `sig_i = min over shingles of (A_i*h + B_i) % M`, as
    * the DuckDB oracle computes independently via explode+groupBy.
    * Exploding the signature ARRAY also needs no shuffle at all — the
    * old explode+groupBy form paid a (doc_id, hash_id)-keyed exchange
    * for the same values. */
  private def minhashSig(d: DataFrame): DataFrame = {
    val cfg = graft.text.Dedup.MinHashConfig(
      shingleN = ShingleN, numHashes = NumHashes, bandRows = BandRows)
    d.where(size(col("toks")) >= ShingleN)
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), ShingleN)).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), x => hash60(0, x) % FpMod).as("hv"))
      .select(col("doc_id"),
        graft.text.Dedup.minhashSigFromHashes(col("hv"), cfg).as("sig_arr"))
      // no-op slice references sig_arr twice, keeping the signature
      // projection materialized below the Generate (same CollapseProject
      // discipline as bandKeysCol — a single-reference generator inlines
      // the whole hash chain, re-evaluating md5-per-shingle 8x)
      .select(col("doc_id"),
        posexplode(slice(col("sig_arr"), lit(1), size(col("sig_arr")))))
      .select(col("doc_id"), col("pos").as("hash_id"), col("col").as("sig"))
  }

  /** (doc_id, simhash): 48-bit SimHash over ALL shingle instances
    * (frequency-weighted, the standard formulation). */
  private def simhash(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(shingles(col("toks"), ShingleN)).as("sgl"))
      .select(col("doc_id"), hash48(0, col("sgl")).as("h48"))
      .select(col("doc_id"), col("h48"),
        explode(sequence(lit(0), lit(47))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("(h48 >> b) & 1") === 1, 1L).otherwise(-1L)).as("sgn"))
      .groupBy("doc_id")
      .agg(sum(when(col("sgn") > 0, expr("shiftleft(cast(1 as bigint), b)"))
        .otherwise(0L)).as("simhash"))

  /** The full MinHash near-dup pipeline with the query-pinned parameters:
    * (doc_a, doc_b, jac) verified pairs at jac >= 0.5 — shared by
    * `q_minhash_near_dup` and `q_near_dup_clusters`. Delegates to the
    * library operator (per-row signatures/band keys, one band-keyed
    * shuffle, verification riding the candidate join — see
    * [[graft.text.Dedup.minhashNearDup]]); value-identical to the
    * exploded construction the oracle mirrors. */
  /** DF-capped shingle-keyed n-gram Jaccard pairs at `threshold` — the
    * shared pair pipeline behind `q_ngram_jaccard_pairs` (near-dup
    * threshold) and `q_pagerank_sim_graph` (low similarity threshold,
    * richer graph). One shingle-keyed self-join; the hot-shingle DF cap
    * keeps the join fan-out flat on boilerplate-heavy corpora. */
  /** One verified pair base at the LOWEST consumer threshold
    * ([[PrJaccardThreshold]], the pagerank graph) with the UNROUNDED
    * jaccard kept: every higher-threshold consumer's pair set is
    * exactly this base re-filtered at its own threshold BEFORE
    * rounding, so the board runs ONE shingle self-join instead of one
    * per threshold (~5 s each at sf0.1). Rows are bit-identical to the
    * old per-threshold builds: the filter applies to the same
    * unrounded jac, and rounding happens after it, as before. */
  private def ngramJaccardPairsBase(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "ngram_jaccard_pairs_base") {
      ngramJaccardPairsBuild(s, dir, PrJaccardThreshold).localCheckpoint()
    }

  private def ngramJaccardPairs(s: SparkSession, dir: String,
                                threshold: Double): DataFrame = {
    require(threshold >= PrJaccardThreshold,
      s"ngramJaccardPairs: threshold $threshold below the memoized base's " +
        s"$PrJaccardThreshold")
    ngramJaccardPairsBase(s, dir)
      .where(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jac"))
  }

  private def ngramJaccardPairsBuild(s: SparkSession, dir: String,
                                     threshold: Double): DataFrame = {
    val d = docs(s, dir)
    val nDocs = d.count()
    val withSh = d
      .where(size(col("toks")) >= ShingleN)
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), ShingleN)).as("sh"))
      .persist()
    val hotRow = withSh.select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") > NgramMaxDocFreqRatio * nDocs)
      .agg(collect_list("s").as("hot")) // one bounded-size row
    val sh = withSh.crossJoin(broadcast(hotRow))
      .select(col("doc_id"), array_except(col("sh"), col("hot")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"), min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast(DoubleType) /
          (col("na") + col("nb") - col("i"))).as("jac"))
      .where(col("jac") >= threshold)
      // jac stays UNROUNDED here: [[ngramJaccardPairs]] rounds after
      // its own threshold filter, exactly where the old per-threshold
      // builds rounded
      .select(col("doc_a"), col("doc_b"), col("jac"))
    graft.text.Dedup.materializeRelease(pairs, withSh)
  }

  private def minhashNearDupPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "minhash_near_dup_pairs") {
      graft.text.Dedup.minhashNearDup(
          tbl(s, dir, "documents"), "doc_id", "text",
          graft.text.Dedup.MinHashConfig(
            shingleN = ShingleN, numHashes = NumHashes, bandRows = BandRows,
            jaccardThreshold = JaccardThreshold, maxDocFreqRatio = 1.0))
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jac"))
        .localCheckpoint()
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, BPE-ish pre-tokenizer count
    // (letter runs / digit runs / single punctuation, the GPT-2-style
    // split shape), distinct tokens, mean token length — map-side only.
    "q_doc_token_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(expr(s"regexp_extract_all(text, '$BpeTokenRegex', 0)"))
          .cast(LongType).as("n_subtokens"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_distinct_tokens"),
        round(aggregate(transform(col("toks"), t => length(t)), lit(0),
          (a, x) => a + x).cast(DoubleType) / size(col("toks")), 6)
          .as("avg_token_len"))
        .orderBy("doc_id")),

    // Quality scoring: stopword ratio, punctuation ratio, composite score.
    "q_text_quality" -> ((s, dir) => {
      val stopR = tokenSetRatio(col("toks"), Stopwords)
      val punctR = punctRatio(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        round(stopR, 6).as("stopword_ratio"),
        round(punctR, 6).as("punct_ratio"),
        round(log(size(col("toks")).cast(DoubleType) + lit(1.0))
          * (lit(1.0) - stopR) * (lit(1.0) - punctR), 6).as("quality_score"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic (marker-stopword argmax) vs the lang label:
    // confusion-matrix counts. The synthetic corpus is English-ish word
    // salad for every label, so the matrix is honest about that.
    "q_lang_id_confusion" -> ((s, dir) => {
      def hits(words: Seq[String]): Column =
        size(filter(col("toks"), t => t.isin(words.map(lit): _*)))
      val (se, sd, sf) = (hits(EnMarkers), hits(DeMarkers), hits(FrMarkers))
      docs(s, dir)
        .select(col("lang"),
          when(se > 0 && se >= sd && se >= sf, "en")
            .when(sd > 0 && sd >= sf, "de")
            .when(sf > 0, "fr")
            .otherwise("und").as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    }),

    // Order-sensitive rolling-hash document fingerprint.
    "q_doc_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), fingerprint(col("toks")).as("fp"))
        .orderBy("doc_id")),

    // Exact + bag-of-words dedup summary: one row
    // (n_docs, n_distinct_text, n_tokenset_keys, n_dup_docs).
    "q_exact_dedup" -> ((s, dir) => {
      val keyed = docs(s, dir).select(
        md5(col("text")).as("tkey"), tokenSetKey(col("toks")).as("skey"))
      val totals = keyed.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("tkey")).as("n_distinct_text"))
      val groups = keyed.groupBy("skey").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_tokenset_keys"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_docs"))
      totals.crossJoin(groups)
    }),

    // n-gram Jaccard near-dup pairs: ONE self-join on the shingle value
    // produces the intersection counts directly (no candidate
    // materialization + re-join), never all-pairs; emit pairs at
    // jac >= 0.5. Shingles in more than NgramMaxDocFreqRatio of docs are
    // dropped first (f² fan-out guard, oracle-mirrored) — as a per-row
    // array_except against a broadcast hot list (bounded by document
    // shape, not corpus size — see Dedup.cappedShingleArrays) instead of
    // an exploded anti-join shuffle. Per-doc set sizes ride the exploded
    // rows into the join, so Jaccard falls out of the pair aggregation
    // itself — no size-lookup joins afterwards. `withSh` (the expensive
    // shingling) is the cached boundary: the hot list and both join
    // sides re-run only the cheap array_except+explode projection on
    // top of it — intentional, since persisting the exploded frame
    // would cache one row per (doc, shingle) instead of one per doc.
    "q_ngram_jaccard_pairs" -> ((s, dir) =>
      ngramJaccardPairs(s, dir, JaccardThreshold).orderBy("doc_a", "doc_b")),

    // Cross-source contamination matrix: verified near-dup pairs
    // aggregated per (source, source) cell — which sources copy from
    // which, the analytic behind per-source mixture-weight decisions
    // (a source whose docs mostly duplicate another is downweighted;
    // `q_mixture_sample` is the downstream consumer of that decision).
    // Scale shape: the pair list is the SMALL output of the dedup
    // pipeline, so it broadcasts into the corpus-sized doc→source map
    // (two map-side probes, zero shuffle on the corpus) and the final
    // agg is |sources|² rows. Cells are source-unordered (least/
    // greatest) like the pair list itself. avg_jac rounds to 4 so
    // cross-engine summation order cannot flip the 6th decimal.
    "q_source_contamination" -> ((s, dir) => {
      val pairs = ngramJaccardPairs(s, dir, JaccardThreshold)
      val src = tbl(s, dir, "documents").select(col("doc_id"), col("source"))
      val withA = src.select(col("doc_id").as("doc_a"), col("source").as("sa"))
        .join(broadcast(pairs), "doc_a")
      val withB = src.select(col("doc_id").as("doc_b"), col("source").as("sb"))
        .join(broadcast(withA), "doc_b")
      withB.select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"), col("jac"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"), round(avg("jac"), 4).as("avg_jac"))
        .orderBy("source_a", "source_b")
    }),

    // MinHash signatures (8 hashes per doc, exploded rows) — per-row
    // signature array posexploded; no shuffle.
    "q_minhash_signatures" -> ((s, dir) =>
      minhashSig(docs(s, dir)).orderBy("doc_id", "hash_id")),

    // MinHash+LSH near-dup: band signatures (4 bands x 2 rows), bucket-join
    // candidates, verify with exact Jaccard. The banding shuffle key is
    // (band, band_key) — this is the shape that scales.
    "q_minhash_near_dup" -> ((s, dir) =>
      minhashNearDupPairs(s, dir).orderBy("doc_a", "doc_b")),

    // Incremental near-dup maintenance (new r11,
    // Dedup.minhashNearDupIncremental): the corpus splits into a base
    // (doc_id % 5 != 0, its band index "stored") and an arrivals batch
    // (doc_id % 5 == 0) that bands map-side and joins the stored index —
    // the arrivals-only work a growing corpus actually runs. The oracle
    // is the IDENTITY ITSELF, cross-engine: DuckDB re-derives the FULL
    // near-dup pipeline over the union and restricts to pairs touching
    // an arrival — equal iff incremental == full recompute.
    "q_incremental_near_dup" -> ((s, dir) => {
      val d = docs(s, dir)
      val cfg = graft.text.Dedup.MinHashConfig(
        shingleN = ShingleN, numHashes = NumHashes, bandRows = BandRows,
        jaccardThreshold = JaccardThreshold, maxDocFreqRatio = 1.0)
      val base = d.where(col("doc_id") % 5 =!= 0)
      val arrivals = d.where(col("doc_id") % 5 === 0)
      val baseBands = graft.text.Dedup.bandRows(
        graft.text.Dedup.rawShingleArrays(base, "doc_id", "text", cfg), cfg)
      graft.text.Dedup.minhashNearDupIncremental(
          baseBands, arrivals, "doc_id", "text", cfg)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jac"))
        .orderBy("doc_a", "doc_b")
    }),

    // Near-dup CLUSTERS: connected components over the verified MinHash
    // pair graph (Dedup.connectedComponents, min-label propagation) —
    // the retention step after pair-finding: cluster_id = min doc id per
    // component, so dedup keeps exactly the doc_id == cluster_id row.
    // Oracle: DuckDB recursive-CTE transitive closure over the same
    // pairs.
    "q_near_dup_clusters" -> ((s, dir) => {
      val pairs = minhashNearDupPairs(s, dir)
      graft.text.Dedup.connectedComponents(pairs)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(array_sort(collect_list(col("doc_id"))),
              x => x.cast("string"))).as("doc_ids"))
        .orderBy("cluster_id")
    }),

    // Canonical-representative selection — the retention step AFTER
    // clustering: instead of q_near_dup_clusters' keep-the-min-id rule,
    // keep each cluster's highest-QUALITY doc (q_text_quality's
    // composite score; ties to the lowest doc_id), the policy real
    // pipelines use so boilerplate copies don't outlive the clean
    // original. One doc-keyed join + one cluster-keyed agg on top of
    // the shared pair memo; the argmax is a single max(struct) — no
    // window, no per-cluster sort. DuckDB replays the whole chain:
    // pairs, transitive closure, quality, argmax with the same
    // tie-break.
    "q_dedup_canonical" -> ((s, dir) => {
      val pairs = minhashNearDupPairs(s, dir)
      val cc = graft.text.Dedup.connectedComponents(pairs)
      val stopR = tokenSetRatio(col("toks"), Stopwords)
      val punctR = punctRatio(col("text"))
      val quality = docs(s, dir).select(col("doc_id"),
        round(log(size(col("toks")).cast(DoubleType) + lit(1.0))
          * (lit(1.0) - stopR) * (lit(1.0) - punctR), 6).as("q"))
      cc.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
        .select(col("cluster_id"), col("n_docs"),
          (-col("best.nid")).as("keep_id"),
          col("best.q").as("keep_quality"),
          (col("n_docs") - 1).as("n_dropped"))
        .orderBy("cluster_id")
    }),

    // Sliding-window chunking (16-token windows, stride 12) — the
    // context-window prep step; chunks identified by content hash so the
    // output stays narrow. Pure map-side explode.
    "q_doc_chunks" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), ((size(col("toks")) - 1) / ChunkStride).cast("int")),
            i => slice(col("toks"), i * ChunkStride + 1, lit(ChunkLen)))))
        .select(col("doc_id"), col("pos").as("chunk_id"),
          size(col("col")).cast(LongType).as("n_chunk_tokens"),
          md5(concat_ws(" ", col("col"))).as("chunk_hash"))
        .orderBy("doc_id", "chunk_id")),

    // Deterministic stratified train/val split: md5-derived bucket of
    // doc_id, 80/20, counted per language stratum.
    "q_stratified_split" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"),
          when(hash60(0, col("doc_id").cast("string")) % 10 < 8, "train")
            .otherwise("val").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")),

    // Per-language top TF-IDF terms: tf per (doc, term), document
    // frequency per term, score(lang, term) = Σ_docs tf × ln(N/df) —
    // the corpus-level term-importance profile (the IR-standard
    // weighting; stopwords self-suppress via idf → 0 as df → N).
    // Multiplying the EXACT integer Σtf by one ln() keeps the float
    // work to a single op per output row, so cross-engine float-sum
    // drift cannot reorder ranks. Shuffles: (doc,term) tf agg,
    // term-keyed df join, (lang,term) agg — all key-partitioned; the
    // final window ranks |langs| × |terms| aggregated rows, not corpus
    // rows.
    "q_tfidf_top_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val nDocs = d.count()
      // slice no-op: keep the split() materialized below the Generate
      // (single-reference inlining would re-split the text per token)
      val tf = d.select(col("doc_id"), col("lang"),
          explode(slice(col("toks"), lit(1), size(col("toks")))).as("term"))
        .groupBy("doc_id", "lang", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(dfreq, "term")
        .groupBy("lang", "term", "df")
        .agg(sum(col("tf")).as("ttf"))
        .select(col("lang"), col("term"),
          (col("ttf").cast(DoubleType)
            * log(lit(nDocs.toDouble) / col("df"))).as("score"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("lang").orderBy(col("score").desc, col("term"))))
        .where(col("rank") <= TfIdfTopK)
        .select(col("lang"), col("rank").cast(LongType).as("rank"),
          col("term"), round(col("score"), 6).as("score"))
        .orderBy("lang", "rank")
    }),

    // Train/benchmark decontamination (the GPT-3-style n-gram overlap
    // check): the deterministic val split (same md5 bucket rule as
    // q_stratified_split) plays the benchmark; a train doc is
    // contaminated when it shares any ContamN-gram with a benchmark
    // doc. Candidates come from a shingle-keyed equi-join against the
    // benchmark shingle set — broadcast, because at 100 TB the
    // benchmark side is a fixed eval suite (KBs-MBs) while the corpus
    // is the big side: contamination then costs one map-side join plus
    // a per-doc aggregation, and the corpus never shuffles on the
    // shingle value.
    "q_decontaminate" -> ((s, dir) => {
      // The slice no-op references `sh` twice, keeping the shingle chain
      // materialized below the Generate (same CollapseProject discipline
      // as minhashSig: a single-reference generator inlines the whole
      // split+transform+concat_ws chain and re-evaluates it PER EXPLODED
      // ELEMENT — measured 5.8 s vs 0.8 s at sf0.1). No size()>0 filter:
      // explode drops empty arrays itself, and the filter form pushes
      // yet another full re-evaluation into the scan.
      val ex = docs(s, dir)
        .select(col("doc_id"),
          (hash60(0, col("doc_id").cast("string")) % 10 < 8).as("is_train"),
          array_distinct(shingles(col("toks"), ContamN)).as("sh"))
        .select(col("doc_id"), col("is_train"),
          posexplode(slice(col("sh"), lit(1), size(col("sh")))))
        .select(col("doc_id"), col("is_train"), col("col").as("s"))
      val bench = ex.where(!col("is_train"))
        .select(col("doc_id").as("bench_id"), col("s"))
      ex.where(col("is_train")).select(col("doc_id"), col("s"))
        .join(broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(countDistinct(col("s")).as("n_hit_shingles"),
          countDistinct(col("bench_id")).as("n_bench_docs"))
        .orderBy("doc_id")
    }),

    // 48-bit shingle SimHash per document.
    "q_simhash" -> ((s, dir) => simhash(docs(s, dir)).orderBy("doc_id")),

    // SimHash near-dup pairs at hamming <= 8 via pigeonhole banding
    // (graft.text.Dedup.simhashBandPairs): the 48-bit simhash splits into
    // maxHamming+1 bands, any pair within the threshold collides on at
    // least one band, so candidates come from a band-keyed equi-join —
    // never all-pairs. The DuckDB oracle stays quadratic (fine at oracle
    // scale) and proves the banding loses nothing.
    "q_simhash_near_pairs" -> ((s, dir) => {
      val sh = simhash(docs(s, dir)).persist()
      graft.text.Dedup.materializeRelease(
        graft.text.Dedup.simhashBandPairs(sh, HammingThreshold), sh)
        .orderBy("doc_a", "doc_b")
    }),

    // Gopher-style repetition quality: per-doc token/bigram repetition
    // stats + keep flag (Rae et al. 2021, arXiv:2112.11446 §A1.1 use
    // duplicate-n-gram fractions as pretraining filters). Two
    // doc_id-keyed aggregations (tokens, bigrams) with map-side combine
    // — per-doc mode via explode+groupBy, the form that scales; a
    // per-row higher-order-function mode would be O(n_tokens²) per doc.
    // All ratios are exact integer divisions, so round(…,6) is
    // drift-free cross-engine.
    "q_repetition_quality" -> ((s, dir) => {
      // Single pass: tokens and bigrams ride one tagged explode
      // (k=0 token, k=1 bigram), so the corpus is scanned/tokenized
      // once and the whole query is two doc_id-keyed aggregations with
      // map-side combine and zero joins (the first form — separate
      // token/bigram chains joined back to a re-scanned base — cost 3
      // scans + 2 joins and measured 6× slower at sf0.1: 4.95 s vs
      // 0.81 s isolated, 3-attempt min).
      val exploded = docs(s, dir)
        .where(size(col("toks")) >= lit(2))
        .select(col("doc_id"), col("lang"),
          explode(concat(
            transform(col("toks"), t => struct(lit(0).as("k"), t.as("g"))),
            transform(sequence(lit(0), size(col("toks")) - 2),
              i => struct(lit(1).as("k"),
                concat_ws(" ", element_at(col("toks"), i + 1),
                  element_at(col("toks"), i + 2)).as("g"))))).as("e"))
        .select(col("doc_id"), col("lang"),
          col("e.k").as("k"), col("e.g").as("g"))
      val tok = col("k") === 0
      val stats = exploded
        .groupBy("doc_id", "lang", "k", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "lang")
        .agg(sum(when(tok, col("c"))).as("n_toks"),
          max(when(tok, col("c"))).as("max_tok"),
          sum(when(tok, 1L)).as("n_uniq"),
          sum(when(!tok, col("c"))).as("n_big"),
          max(when(!tok, col("c"))).as("max_big"))
      val ur = col("n_uniq").cast(DoubleType) / col("n_toks")
      val tf = col("max_tok").cast(DoubleType) / col("n_toks")
      val bf = col("max_big").cast(DoubleType) / col("n_big")
      stats.select(col("doc_id"), col("lang"),
          col("n_toks").cast(LongType).as("n_toks"),
          round(ur, 6).as("unique_ratio"),
          round(tf, 6).as("top_tok_frac"),
          round(bf, 6).as("top_bigram_frac"),
          (ur >= RepMinUniqueRatio && tf <= RepMaxTopTokFrac).as("keep"))
        .orderBy("doc_id")
    }),

    // Per-source data card — the corpus-health rollup an ingest run
    // publishes: exact-dup rate, unigram-perplexity keep rate,
    // repetition keep rate, token mass, language spread, all per
    // source. Composes three independently-oracle-green signals
    // (q_exact_dedup's key, q_unigram_ppl's threshold,
    // q_repetition_quality's ratios) into one row per source; DuckDB
    // re-derives every signal, so semantic drift in any one of them
    // breaks the card's hash. Shapes are the standalone ones: dup flag
    // is a digest-keyed agg + join-back, ppl is broadcast-vocab
    // map-side scoring, repetition is the one-pass tagged explode;
    // the final rollup is |sources| rows.
    "q_quality_report" -> ((s, dir) => {
      val base = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          tokens(col("text")).as("toks"))
      // dup flag: not the lowest doc_id of its TOKEN-SET group
      // (q_exact_dedup's skey — the raw-text key is trivially dup-free
      // on this corpus, measured: 0 groups vs 21 token-set groups)
      val keeper = base.groupBy(tokenSetKey(col("toks")).as("skey"))
        .agg(min(col("doc_id")).as("keeper"))
      val dupFlag = base.select(col("doc_id"), tokenSetKey(col("toks")).as("skey"))
        .join(keeper, "skey")
        .select(col("doc_id"), (col("doc_id") =!= col("keeper")).as("is_dup"))
      // unigram-ppl keep (q_unigram_ppl's exact scoring + threshold)
      val tok = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
      val lnTotal = vocab.agg(log(sum(col("tf"))).as("ln_total"))
      val pplKeep = tok.join(broadcast(vocab), "tok")
        .crossJoin(broadcast(lnTotal))
        .groupBy("doc_id")
        .agg((round(max(col("ln_total")) - avg(log(col("tf"))), 6)
          <= PplMaxAvgNll).as("ppl_keep"))
      // repetition keep: the report uses only the UNIGRAM ratios of
      // q_repetition_quality (unique_ratio, top_tok_frac), so it reuses
      // the `tok` frame already exploded for ppl scoring above — no
      // second tokenize/explode and no bigram half (the first draft
      // carried the full tagged explode and threw the bigram rows away,
      // roughly doubling the explode+agg for nothing — review finding).
      // Docs with < 2 tokens have no repetition stats -> keep = false.
      val repKeep = base.select(col("doc_id"), size(col("toks")).as("sz"))
        .where(col("sz") >= 2).select("doc_id")
        .join(tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
            .groupBy("doc_id")
            .agg(sum(col("c")).as("n_toks"), max(col("c")).as("max_tok"),
              count(lit(1)).as("n_uniq")),
          "doc_id")
        .select(col("doc_id"),
          (col("n_uniq").cast(DoubleType) / col("n_toks") >= RepMinUniqueRatio
            && col("max_tok").cast(DoubleType) / col("n_toks")
              <= RepMaxTopTokFrac).as("rep_keep"))
      base.select(col("doc_id"), col("lang"), col("source"),
          size(col("toks")).cast(LongType).as("n_toks"))
        .join(dupFlag, "doc_id")
        .join(pplKeep, "doc_id")
        .join(repKeep, Seq("doc_id"), "left")
        .na.fill(false, Seq("rep_keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_toks")).as("total_toks"),
          round(sum(when(col("is_dup"), 1L).otherwise(0L))
            .cast(DoubleType) / count(lit(1)), 6).as("dup_rate"),
          round(sum(when(col("ppl_keep"), 1L).otherwise(0L))
            .cast(DoubleType) / count(lit(1)), 6).as("ppl_keep_rate"),
          round(sum(when(col("rep_keep"), 1L).otherwise(0L))
            .cast(DoubleType) / count(lit(1)), 6).as("rep_keep_rate"))
        .orderBy("source")
    }),

    // Domain-mixture sampling: deterministic per-source keep rates (the
    // "sample web at 10%, books at 100%" training-mixture step) via the
    // md5-derived uniform, counted per source. Sampling is a scan-side
    // map filter — at 100 TB the kept rows never shuffle; only the
    // 20-row per-source summary aggregates.
    "q_mixture_sample" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          mixtureKeep(col("source"), col("doc_id"), MixtureRates).as("kept"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L))
            .as("kept_chars"))
        .orderBy("source")
    }),

    // Context-window packing (concatenate-and-chop): docs stream per
    // source in doc_id order, token streams chop into PackWindow-token
    // windows — per source: window count, docs straddling a boundary,
    // fill of the final partial window. The running sum partitions by
    // source (parallel across sources; a 100 TB run sub-shards the
    // stream key), never a global single-partition window.
    "q_context_pack" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      val start = coalesce(sum(col("n_toks")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      tbl(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("n_toks"))
        .select(col("source"), col("n_toks"),
          floor(start / PackWindow).as("first_win"),
          floor((start + col("n_toks") - 1) / PackWindow).as("last_win"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          (floor((sum(col("n_toks")) - 1) / PackWindow) + 1)
            .as("n_windows"),
          sum(when(col("first_win") =!= col("last_win"), 1L)
            .otherwise(0L)).as("n_straddling"),
          (((sum(col("n_toks")) - 1) % PackWindow) + 1).as("last_fill"))
        .orderBy("source")
    }),

    // Deterministic training-shard layout — the "seeded global shuffle
    // then shard" step that writes the final training corpus: every doc
    // → one of NumShards shards by md5 bucket; within-shard order by an
    // INDEPENDENT md5 (decorrelated from the shard key, so shard files
    // are internally shuffled too). The per-shard order fingerprint
    // (md5 over doc_ids in within-shard order) makes the ORDER itself
    // cross-engine-checked, not just the assignment. Assignment and
    // order key are scan-side maps; one shard-keyed shuffle aggregates
    // — the same plan that writes partitionBy(shard) sorted files at
    // 100 TB, with the shard count scaled up.
    "q_training_shards" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("n_toks"),
          pmod(hash60(11, col("doc_id").cast("string")), lit(NumShards.toLong))
            .as("shard"),
          hash60(12, col("doc_id").cast("string")).as("ord"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          md5(array_join(
            transform(
              array_sort(collect_list(struct(col("ord"), col("doc_id")))),
              x => x.getField("doc_id").cast("string")),
            ",")).as("order_fp"))
        .orderBy("shard")),

    // Zipf-law fit over the vocabulary head: OLS of ln(tf) on ln(rank)
    // for the top-ZipfHead terms — the corpus-health statistic (natural
    // text slopes ≈ −1; a synthetic or template-heavy corpus shows up
    // immediately — and does: the testdata measures slope −0.18 at
    // R² 0.06 over its 31-term vocabulary, flagging itself as
    // template-generated, exactly what this check exists to catch on a
    // real ingest). The vocab aggregation is corpus-wide but
    // Zipf-bounded; the rank window runs AFTER the top-ZipfHead cut, so
    // the single-partition window sees 200 rows, never the vocabulary.
    // DuckDB oracles with its native regr_* aggregates over the same
    // head — the independent-second-derivation pattern of
    // q_ols_qty_revenue; restricting to the head keeps the float power
    // sums 200 terms long, far below the 6-decimal compare.
    "q_zipf_fit" -> ((s, dir) => {
      val vocab = docs(s, dir)
        .select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      val top = vocab.orderBy(desc("tf"), asc("tok")).limit(ZipfHead)
      val w = Window.orderBy(desc("tf"), asc("tok"))
      val xy = top.withColumn("rank", row_number().over(w))
        .select(log(col("rank")).as("x"), log(col("tf")).as("y"))
      xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_terms"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")))
            * col("sx")) / col("n"), 4).as("intercept"),
          round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2)
            / ((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
    }),

    // Interpolated bigram-LM scoring (Jelinek–Mercer mixing, the
    // fixed-weight case of Chen & Goodman 1999):
    // P(w|v) = λ·c2(v,w)/c1(v) + (1−λ)·c1(w)/T, first token scored by
    // the unigram alone. One doc_id-keyed exchange forms bigrams via
    // lag() (the sessionize shape — keyed by a high-cardinality column,
    // never a global window); unigram counts broadcast; the bigram
    // table is Zipf-heavier than the unigram vocab, so at 100 TB its
    // join is (prev,cur)-key-partitioned rather than broadcast — which
    // is why the join below deliberately does NOT broadcast c2.
    "q_bigram_ppl" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("lang"), posexplode(col("toks")))
        .select(col("doc_id"), col("lang"), col("pos"), col("col").as("cur"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("prev", lag(col("cur"), 1).over(w))
      val uni = tok.groupBy(col("cur").as("tok")).agg(count(lit(1)).as("c1"))
      val tot = uni.agg(sum(col("c1")).cast("double").as("tot"))
      val c2 = big.where(col("prev").isNotNull)
        .groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      val p = when(col("prev").isNull, col("c1w") / col("tot"))
        .otherwise(lit(BigramLambda) * coalesce(col("c2"), lit(0L)) / col("c1v")
          + lit(1 - BigramLambda) * col("c1w") / col("tot"))
      val nll = round(avg(-log(col("p"))), 6)
      big
        .join(broadcast(uni.select(col("tok").as("cur"), col("c1").as("c1w"))), "cur")
        .join(broadcast(uni.select(col("tok").as("prev"), col("c1").as("c1v"))),
          Seq("prev"), "left")
        .join(c2, Seq("prev", "cur"), "left")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("lang"), p.as("p"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"), nll.as("avg_nll"),
          round(exp(avg(-log(col("p")))), 6).as("ppl"))
        .select(col("doc_id"), col("lang"), col("n_toks"), col("avg_nll"),
          col("ppl"), (col("avg_nll") <= BigramMaxAvgNll).as("keep"))
        .orderBy("doc_id")
    }),

    // Per-source token-budget selection — "web capped at N tokens,
    // books uncapped" as a deterministic cut: docs stream per source in
    // an md5-shuffled order and are kept while their START offset is
    // under the budget (so the crossing doc is included and the cut is
    // reproducible). The same source-partitioned prefix sum as
    // q_context_pack; a mono-source 100 TB corpus sub-shards the
    // stream key.
    "q_token_budget" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("ord", "doc_id")
      val start = coalesce(sum(col("n_toks")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      tbl(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("n_toks"),
          hash60(21, col("doc_id").cast("string")).as("ord"))
        .select(col("source"), col("n_toks"),
          (start < TokenBudget).as("kept"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_toks")).otherwise(0L))
            .as("kept_tokens"))
        .orderBy("source")
    }),

    // CCNet-style unigram-LM scoring (Wenzek et al. 2020,
    // arXiv:1911.00359 §4.3): corpus-derived token logprobs → per-doc
    // mean negative log-likelihood + perplexity; keep = low-NLL head.
    // The vocab is Zipf-bounded, so at 100 TB it broadcast-joins onto
    // the exploded token stream (top-V plus an OOV floor) — per-token
    // scoring stays map-side and only the doc-keyed mean shuffles.
    // mean NLL = ln(total) − mean(ln tf): every ln input is an exact
    // integer-valued double, so cross-engine drift is summation-order
    // rounding only, far below round(…,6).
    "q_unigram_ppl" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
      val lnTotal = vocab.agg(log(sum(col("tf"))).as("ln_total"))
      val nll = max(col("ln_total")) - avg(log(col("tf")))
      tok.join(broadcast(vocab), "tok")
        .crossJoin(broadcast(lnTotal))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"),
          round(nll, 6).as("avg_nll"),
          round(exp(nll), 6).as("ppl"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("avg_nll"), col("ppl"),
          (col("avg_nll") <= PplMaxAvgNll).as("keep"))
        .orderBy("doc_id")
    }),

    // PageRank over the n-gram SIMILARITY graph (jac >= 0.02 — the
    // near-dup threshold yields only degree-regular 2-cliques, where PR
    // is trivially uniform; the low threshold gives 333 nodes at
    // degrees 1-8 on this corpus) — the iterative graph operator beyond
    // connected components (centrality of a doc inside its similarity
    // neighborhood; high-rank docs are the canonical representatives a
    // dedup pass should keep). Fixed 5 power iterations at damping
    // 0.85 over the symmetrized edge list; the edge/degree tables are
    // computed ONCE and cached (each iteration is one edge-keyed join
    // + one dst-keyed aggregation — the CC loop's shape, O(iters)
    // rounds, never all-pairs). All nodes have degree >= 1 (pair
    // graph), so there is no dangling-mass term and the oracle can
    // unroll the same 5 iterations in SQL. Scale note: a fixed LOW
    // similarity threshold densifies superlinearly with corpus growth
    // (chance 3-gram overlap: 1.13M candidates -> 31k edges at sf0.1) —
    // at 100 TB the edge list comes from the near-dup pipeline or a
    // raised threshold; the PR loop itself is edge-count-linear per
    // iteration.
    "q_pagerank_sim_graph" -> ((s, dir) => {
      val pairs = ngramJaccardPairs(s, dir, PrJaccardThreshold)
        .select("doc_a", "doc_b")
      val edges = pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst")
      // degree pre-joined onto the cached edge table: each iteration is
      // then ONE src-keyed join + one dst-keyed aggregation
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesWithDeg = edges.join(deg, "src").persist()
      val nodes = edgesWithDeg.select(col("src").as("d")).distinct()
      val n = nodes.count()
      var ranks = nodes.select(col("d"), lit(1.0 / n).as("r"))
      for (_ <- 1 to PrIters) {
        val contrib = edgesWithDeg.join(ranks, col("src") === col("d"))
          .select(col("dst"), (col("r") / col("deg")).as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        ranks = contrib.select(col("dst").as("d"),
          (lit((1.0 - PrDamping) / n) + lit(PrDamping) * col("contrib")).as("r"))
      }
      // materialize the final (small) rank table and RELEASE the cached
      // edge table — a library caller invoking this repeatedly must not
      // leak one pinned edge cache per call (the CC/beam-loop pattern)
      graft.text.Dedup.materializeRelease(
        ranks.select(col("d").as("doc_id"), round(col("r"), 6).as("pr"))
          .orderBy("doc_id"),
        edgesWithDeg)
    }),

    // Exact-substring duplicate coverage (Lee et al. 2022
    // arXiv:2107.06499): fraction of each doc's tokens inside an
    // 8-token span that also appears in ANOTHER document. Two
    // shuffles at scale: one on the 60-bit span hash (cross-doc
    // frequency), one doc_id-keyed re-aggregation; the covered-token
    // union explodes only DUPLICATED span starts (SpanN x dup rows),
    // never the whole token stream.
    "q_dup_span_coverage" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
      val spans = base
        .select(col("doc_id"), posexplode(shingles(col("toks"), SpanN)))
        .select(col("doc_id"), col("pos"), hash60(0, col("col")).as("h"))
      val dupH = spans.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("d"))
        .where(col("d") >= 2).select("h")
      val cov = spans.join(dupH, "h")
        .select(col("doc_id"), col("pos"),
          explode(sequence(col("pos"), col("pos") + lit(SpanN - 1))).as("p"))
        .groupBy("doc_id")
        .agg(countDistinct(col("pos")).as("dup_spans"),
          countDistinct(col("p")).as("covered_toks"))
      base.select(col("doc_id"), col("n_toks"),
          greatest(col("n_toks") - lit(SpanN - 1), lit(0)).cast(LongType)
            .as("n_spans"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks").cast(LongType).as("n_toks"),
          col("n_spans"),
          coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
          coalesce(col("covered_toks"), lit(0L)).as("covered_toks"),
          round(coalesce(col("covered_toks"), lit(0L)).cast(DoubleType)
            / col("n_toks"), 6).as("coverage"))
        .withColumn("keep", col("coverage") <= DupCoverageMax)
        .orderBy("doc_id")
    }),

    // Sensitive-content scrub: regex detectors (email — the zero-match
    // path on this corpus) + lexicon replacement, pure map-side work
    // (regexp_count/regexp_replace are codegen'd built-ins); at 100 TB
    // this is a scan-side projection that never shuffles.
    "q_pii_redact" -> ((s, dir) => {
      val lexRe = s"\\b(${PiiLexicon.mkString("|")})\\b"
      // `redacted` is referenced twice downstream (length + fingerprint),
      // so materializing it in its own projection keeps the two
      // regexp_replace passes evaluated ONCE per row — CollapseProject
      // never inlines a multi-reference non-cheap alias (the same
      // discipline as the q_embedding_quantize r8 fix).
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          regexp_replace(
            regexp_replace(col("text"), lit(EmailRegex), lit("[EMAIL]")),
            lit(lexRe), lit("[PII]")).as("redacted"))
        .select(col("doc_id"),
          regexp_count(col("text"), lit(EmailRegex)).cast(LongType)
            .as("n_email"),
          regexp_count(col("text"), lit(lexRe)).cast(LongType)
            .as("n_lexicon"),
          length(col("text")).cast(LongType).as("n_chars_raw"),
          length(col("redacted")).cast(LongType).as("n_chars_redacted"),
          hash60(0, col("redacted")).as("redacted_fp"))
        .orderBy("doc_id")
    }),

    // DSIR data selection (Xie et al. 2023 arXiv:2302.03169): score
    // each doc by the mean log importance ratio between an add-1
    // unigram LM of the TARGET slice (lang='en') and one of the raw
    // corpus. The vocab table is small (broadcast); per-token scoring
    // rides the scan, and only the doc_id-keyed mean aggregates — the
    // same shape as q_unigram_ppl, so kept rows never shuffle at 100 TB.
    "q_dsir_weights" -> ((s, dir) => {
      val t = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("w"))
      val v = t.groupBy("w").agg(count(lit(1)).as("tf_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tf_t"))
      val tot = v.agg(sum(col("tf_r")).as("nr"), sum(col("tf_t")).as("nt"),
        count(lit(1)).as("vsz"))
      val lw = avg(
        log((col("tf_t") + lit(1.0)) / (col("nt") + col("vsz")))
          - log((col("tf_r") + lit(1.0)) / (col("nr") + col("vsz"))))
      t.join(broadcast(v), "w").crossJoin(broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"), round(lw, 6).as("avg_log_ratio"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("avg_log_ratio"),
          (col("avg_log_ratio") > DsirMinAvgLogRatio).as("keep"))
        .orderBy("doc_id")
    })
  )

  // ---- DuckDB oracle SQL ----------------------------------------------

  /** Shared fragments mirroring TextFunctions (see its scaladoc for the
    * cross-engine hash contract). */
  private[queries] val tokCte =
    """tok AS (
      |  SELECT doc_id, lang, text,
      |         string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |)""".stripMargin

  private[queries] val shgCte = // distinct shingles per doc
    s"""shg AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(range(0, len(toks)-${ShingleN - 1}),
       |           i -> array_to_string(toks[i+1:i+$ShingleN], ' ')))) AS s
       |  FROM tok
       |)""".stripMargin

  private[queries] val sigCte =
    s"""hbase AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT % ${FpMod} AS h
       |  FROM shg
       |),
       |sig AS (
       |  SELECT doc_id, hid,
       |         min((${HashA.mkString("[", ", ", "]")}[hid + 1] * h
       |              + ${HashB.mkString("[", ", ", "]")}[hid + 1]) % ${FpMod}) AS sig
       |  FROM hbase, (SELECT unnest(range($NumHashes)) AS hid)
       |  GROUP BY doc_id, hid
       |)""".stripMargin

  private val simhashCte =
    s"""shu AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(0, len(toks)-${ShingleN - 1}),
       |           i -> array_to_string(toks[i+1:i+$ShingleN], ' '))) AS sgl
       |  FROM tok
       |),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5('0:' || sgl), 1, 12))::BIGINT AS h48
       |  FROM shu
       |),
       |bits AS (
       |  SELECT doc_id, b,
       |         sum(CASE WHEN (h48 >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
       |  FROM h, (SELECT unnest(range(48)) AS b)
       |  GROUP BY doc_id, b
       |),
       |sh AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN sgn > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  /** jac scoring of `cand(doc_a, doc_b)` against a shingle table —
    * mirrors Dedup.verifyJaccard / the inline array_intersect form. */
  private[queries] def jacSql(candCte: String, shgTable: String = "shg"): String =
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM $shgTable GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM $candCte c
       |  JOIN $shgTable sa ON c.doc_a = sa.doc_id
       |  JOIN $shgTable sb ON c.doc_b = sb.doc_id AND sa.s = sb.s
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |jac AS (
       |  SELECT doc_a, doc_b,
       |         i::DOUBLE / (na.n + nb.n - i) AS jac
       |  FROM inter
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id
       |)""".stripMargin

  /** Document-frequency-capped shingle table (hot-shingle skew guard,
    * mirroring Dedup.shingleTable's maxDocFreqRatio). */
  private val shfCte =
    s"""shcnt AS (SELECT s, count(*) AS df FROM shg GROUP BY s),
       |nd AS (SELECT count(*) AS n FROM documents),
       |shf AS (
       |  SELECT shg.doc_id, shg.s
       |  FROM shg JOIN shcnt ON shg.s = shcnt.s, nd
       |  WHERE shcnt.df <= $NgramMaxDocFreqRatio * nd.n
       |)""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  override def oracleSql: Map[String, String] = Map(
    "q_doc_token_stats" ->
      s"""WITH $tokCte
         |SELECT doc_id,
         |  len(toks)::BIGINT AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
         |    AS n_subtokens,
         |  len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
         |  round(list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks), 6)
         |    AS avg_token_len
         |FROM tok ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""WITH $tokCte,
         |r AS (
         |  SELECT doc_id,
         |    len(list_filter(toks, t -> t IN ${inList(Stopwords)}))::DOUBLE
         |      / len(toks) AS stop_r,
         |    (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
         |      / length(text) AS punct_r,
         |    len(toks) AS n_tokens
         |  FROM tok
         |)
         |SELECT doc_id,
         |  round(stop_r, 6) AS stopword_ratio,
         |  round(punct_r, 6) AS punct_ratio,
         |  round(ln(n_tokens::DOUBLE + 1.0) * (1.0 - stop_r) * (1.0 - punct_r), 6)
         |    AS quality_score
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_lang_id_confusion" ->
      s"""WITH $tokCte,
         |sc AS (
         |  SELECT lang,
         |    len(list_filter(toks, t -> t IN ${inList(EnMarkers)})) AS se,
         |    len(list_filter(toks, t -> t IN ${inList(DeMarkers)})) AS sd,
         |    len(list_filter(toks, t -> t IN ${inList(FrMarkers)})) AS sf
         |  FROM tok
         |)
         |SELECT lang,
         |  CASE WHEN se > 0 AND se >= sd AND se >= sf THEN 'en'
         |       WHEN sd > 0 AND sd >= sf THEN 'de'
         |       WHEN sf > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang,
         |  count(*) AS n_docs
         |FROM sc GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q_doc_fingerprint" ->
      s"""WITH $tokCte
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(0::BIGINT, list_transform(toks,
         |      t -> ('0x' || substr(md5('0:' || t), 1, 15))::BIGINT % ${FpMod})),
         |    (a, x) -> (a * ${FpMul} + x) % ${FpMod}) AS fp
         |FROM tok ORDER BY doc_id""".stripMargin,

    "q_exact_dedup" ->
      s"""WITH $tokCte,
         |keyed AS (
         |  SELECT md5(text) AS tkey,
         |         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS skey
         |  FROM tok
         |),
         |totals AS (
         |  SELECT count(*) AS n_docs, count(DISTINCT tkey) AS n_distinct_text
         |  FROM keyed
         |),
         |grp AS (SELECT skey, count(*) AS c FROM keyed GROUP BY skey),
         |gsum AS (
         |  SELECT count(*) AS n_tokenset_keys,
         |         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_docs
         |  FROM grp
         |)
         |SELECT * FROM totals CROSS JOIN gsum""".stripMargin,

    "q_ngram_jaccard_pairs" ->
      s"""WITH $tokCte, $shgCte, $shfCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand", "shf")}
         |SELECT doc_a, doc_b, round(jac, 6) AS jac
         |FROM jac WHERE jac >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Same pair pipeline re-derived end-to-end, then rolled up to the
    // per-source-pair matrix the Spark side computes.
    "q_source_contamination" ->
      s"""WITH $tokCte, $shgCte, $shfCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand", "shf")},
         |p AS (
         |  SELECT doc_a, doc_b, round(jac, 6) AS jac
         |  FROM jac WHERE jac >= $JaccardThreshold
         |),
         |m AS (
         |  SELECT least(sa.source, sb.source) AS source_a,
         |         greatest(sa.source, sb.source) AS source_b, p.jac
         |  FROM p
         |  JOIN documents sa ON sa.doc_id = p.doc_a
         |  JOIN documents sb ON sb.doc_id = p.doc_b
         |)
         |SELECT source_a, source_b, count(*) AS n_pairs,
         |       round(avg(jac), 4) AS avg_jac
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,

    "q_minhash_signatures" ->
      s"""WITH $tokCte, $shgCte, $sigCte
         |SELECT doc_id, hid AS hash_id, sig
         |FROM sig ORDER BY doc_id, hash_id""".stripMargin,

    "q_minhash_near_dup" ->
      s"""WITH $tokCte, $shgCte, $sigCte,
         |bands AS (
         |  SELECT doc_id, hid // $BandRows AS band,
         |         md5(string_agg(sig::VARCHAR, ',' ORDER BY hid)) AS bkey
         |  FROM sig GROUP BY doc_id, band
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |              AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand")}
         |SELECT doc_a, doc_b, round(jac, 6) AS jac
         |FROM jac WHERE jac >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,

    // The incremental identity, replayed from scratch: FULL pipeline
    // over the union, restricted to arrival-touching pairs.
    "q_incremental_near_dup" ->
      s"""WITH $tokCte, $shgCte, $sigCte,
         |bands AS (
         |  SELECT doc_id, hid // $BandRows AS band,
         |         md5(string_agg(sig::VARCHAR, ',' ORDER BY hid)) AS bkey
         |  FROM sig GROUP BY doc_id, band
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |              AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand")}
         |SELECT doc_a, doc_b, round(jac, 6) AS jac
         |FROM jac
         |WHERE jac >= $JaccardThreshold
         |  AND (doc_a % 5 = 0 OR doc_b % 5 = 0)
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Same pipeline, then transitive closure (recursive CTE) in place of
    // the Spark-side min-label propagation: cluster_id = min reachable id.
    "q_near_dup_clusters" ->
      s"""WITH RECURSIVE $tokCte, $shgCte, $sigCte,
         |bands AS (
         |  SELECT doc_id, hid // $BandRows AS band,
         |         md5(string_agg(sig::VARCHAR, ',' ORDER BY hid)) AS bkey
         |  FROM sig GROUP BY doc_id, band
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |              AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand")},
         |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jac >= $JaccardThreshold),
         |nodes AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |),
         |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT cluster_id, count(*) AS n_docs,
         |       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
         |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // Same pair graph + transitive closure, then the quality argmax
    // with the identical (quality DESC, doc_id ASC) tie-break replayed
    // as a window rank.
    "q_dedup_canonical" ->
      s"""WITH RECURSIVE $tokCte, $shgCte, $sigCte,
         |bands AS (
         |  SELECT doc_id, hid // $BandRows AS band,
         |         md5(string_agg(sig::VARCHAR, ',' ORDER BY hid)) AS bkey
         |  FROM sig GROUP BY doc_id, band
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |              AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand")},
         |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jac >= $JaccardThreshold),
         |nodes AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |),
         |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
         |q AS (
         |  SELECT doc_id,
         |    round(ln(len(toks)::DOUBLE + 1.0)
         |      * (1.0 - len(list_filter(toks, t -> t IN ${inList(Stopwords)}))::DOUBLE
         |          / len(toks))
         |      * (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
         |          / length(text)), 6) AS q
         |  FROM tok
         |),
         |j AS (
         |  SELECT comp.cluster_id, comp.doc_id, q.q,
         |         row_number() OVER (PARTITION BY comp.cluster_id
         |                            ORDER BY q.q DESC, comp.doc_id) AS rn
         |  FROM comp JOIN q USING (doc_id)
         |),
         |g AS (SELECT cluster_id, count(*) AS n_docs FROM j GROUP BY cluster_id)
         |SELECT g.cluster_id, g.n_docs, j.doc_id AS keep_id, j.q AS keep_quality,
         |       g.n_docs - 1 AS n_dropped
         |FROM g JOIN j ON j.cluster_id = g.cluster_id AND j.rn = 1
         |ORDER BY g.cluster_id""".stripMargin,

    "q_doc_chunks" ->
      s"""WITH $tokCte,
         |c AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(0, (len(toks)-1) // $ChunkStride + 1),
         |           i -> toks[i*$ChunkStride+1 : i*$ChunkStride+$ChunkLen]))
         |           AS chunk,
         |         unnest(range(0, (len(toks)-1) // $ChunkStride + 1)) AS chunk_id
         |  FROM tok
         |  WHERE len(toks) > 0
         |)
         |SELECT doc_id, chunk_id,
         |  len(chunk)::BIGINT AS n_chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_stratified_split" ->
      """SELECT lang,
        |  CASE WHEN ('0x' || substr(md5('0:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 8
        |       THEN 'train' ELSE 'val' END AS split,
        |  count(*) AS n_docs
        |FROM documents
        |GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "q_tfidf_top_terms" ->
      s"""WITH $tokCte,
         |ex AS (SELECT doc_id, lang, unnest(toks) AS term FROM tok),
         |tf AS (
         |  SELECT doc_id, lang, term, count(*) AS tf
         |  FROM ex GROUP BY doc_id, lang, term
         |),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |nd AS (SELECT count(*) AS n FROM documents),
         |sc AS (
         |  SELECT lang, term,
         |         sum(tf)::DOUBLE * ln(nd.n::DOUBLE / df) AS score
         |  FROM tf JOIN dfq USING (term), nd
         |  GROUP BY lang, term, df, nd.n
         |),
         |rk AS (
         |  SELECT lang, term, score,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY score DESC, term) AS rank
         |  FROM sc
         |)
         |SELECT lang, rank, term, round(score, 6) AS score
         |FROM rk WHERE rank <= $TfIdfTopK ORDER BY lang, rank""".stripMargin,

    "q_decontaminate" ->
      s"""WITH $tokCte,
         |spl AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5('0:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 8
         |           AS is_train,
         |         toks
         |  FROM tok
         |),
         |csh AS (
         |  SELECT doc_id, is_train,
         |         unnest(list_distinct(list_transform(range(0, len(toks)-${ContamN - 1}),
         |           i -> array_to_string(toks[i+1:i+$ContamN], ' ')))) AS s
         |  FROM spl
         |)
         |SELECT t.doc_id,
         |       count(DISTINCT t.s) AS n_hit_shingles,
         |       count(DISTINCT b.doc_id) AS n_bench_docs
         |FROM csh t JOIN csh b ON t.s = b.s AND t.is_train AND NOT b.is_train
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_simhash" ->
      s"""WITH $tokCte, $simhashCte
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,

    "q_simhash_near_pairs" ->
      s"""WITH $tokCte, $simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS ham
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_repetition_quality" ->
      s"""WITH $tokCte,
         |base AS (
         |  SELECT doc_id, lang, toks,
         |         list_transform(range(0, len(toks)-1),
         |           i -> toks[i+1] || ' ' || toks[i+2]) AS bigrams
         |  FROM tok WHERE len(toks) >= 2
         |),
         |tc AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS g FROM base)
         |  GROUP BY doc_id, g
         |),
         |ts AS (
         |  SELECT doc_id, sum(c) AS n_toks, max(c) AS max_tok,
         |         count(*) AS n_uniq
         |  FROM tc GROUP BY doc_id
         |),
         |bc AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(bigrams) AS g FROM base)
         |  GROUP BY doc_id, g
         |),
         |bs AS (
         |  SELECT doc_id, sum(c) AS n_big, max(c) AS max_big
         |  FROM bc GROUP BY doc_id
         |)
         |SELECT base.doc_id, lang, n_toks::BIGINT AS n_toks,
         |  round(n_uniq::DOUBLE / n_toks, 6) AS unique_ratio,
         |  round(max_tok::DOUBLE / n_toks, 6) AS top_tok_frac,
         |  round(max_big::DOUBLE / n_big, 6) AS top_bigram_frac,
         |  (n_uniq::DOUBLE / n_toks >= $RepMinUniqueRatio
         |    AND max_tok::DOUBLE / n_toks <= $RepMaxTopTokFrac) AS keep
         |FROM base JOIN ts USING (doc_id) JOIN bs USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_quality_report" ->
      s"""WITH t2 AS (
         |  SELECT doc_id, lang, source, text,
         |         string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |),
         |dup AS (
         |  SELECT doc_id,
         |    doc_id <> min(doc_id) OVER (
         |      PARTITION BY md5(array_to_string(list_sort(list_distinct(toks)), ' '))
         |    ) AS is_dup
         |  FROM t2
         |),
         |tk AS (SELECT doc_id, unnest(toks) AS tok FROM t2),
         |v AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok),
         |tot AS (SELECT ln(sum(tf)) AS ln_total FROM v),
         |ppl AS (
         |  SELECT doc_id,
         |    round(max(ln_total) - avg(ln(tf)), 6) <= $PplMaxAvgNll AS ppl_keep
         |  FROM tk JOIN v USING (tok) CROSS JOIN tot
         |  GROUP BY doc_id
         |),
         |tc AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS g FROM t2 WHERE len(toks) >= 2)
         |  GROUP BY doc_id, g
         |),
         |rep AS (
         |  SELECT doc_id,
         |    (count(*)::DOUBLE / sum(c) >= $RepMinUniqueRatio
         |      AND max(c)::DOUBLE / sum(c) <= $RepMaxTopTokFrac) AS rep_keep
         |  FROM tc GROUP BY doc_id
         |)
         |SELECT source, count(*) AS n_docs,
         |  count(DISTINCT lang) AS n_langs,
         |  sum(len(toks))::BIGINT AS total_toks,
         |  round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |    AS dup_rate,
         |  round(sum(CASE WHEN ppl_keep THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |    AS ppl_keep_rate,
         |  round(sum(CASE WHEN coalesce(rep_keep, false) THEN 1 ELSE 0 END)::DOUBLE
         |        / count(*), 6) AS rep_keep_rate
         |FROM t2
         |JOIN dup USING (doc_id)
         |JOIN ppl USING (doc_id)
         |LEFT JOIN rep USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,

    "q_mixture_sample" ->
      s"""WITH d AS (
         |  SELECT source, n_chars,
         |    (CASE regexp_extract(source, '([0-9]+)$$', 1)::INT % ${MixtureRates.size}
         |       ${MixtureRates.zipWithIndex
               .map { case (r, i) => s"WHEN $i THEN $r" }.mkString(" ")}
         |     END) AS rate,
         |    (('0x' || substr(md5('1:' || 'mix:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % 10000)::DOUBLE / 10000.0 AS u
         |  FROM documents
         |)
         |SELECT source, count(*) AS n_docs,
         |  sum(CASE WHEN u < rate THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  sum(CASE WHEN u < rate THEN n_chars ELSE 0 END)::BIGINT AS kept_chars
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q_context_pack" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_toks
         |  FROM documents
         |),
         |w AS (
         |  SELECT source, n_toks,
         |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
         |  FROM d
         |)
         |SELECT source, count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
         |  (floor((sum(n_toks) - 1) / $PackWindow) + 1)::BIGINT AS n_windows,
         |  sum(CASE WHEN floor(start / $PackWindow)
         |             != floor((start + n_toks - 1) / $PackWindow)
         |           THEN 1 ELSE 0 END)::BIGINT AS n_straddling,
         |  (((sum(n_toks) - 1) % $PackWindow) + 1)::BIGINT AS last_fill
         |FROM w GROUP BY source ORDER BY source""".stripMargin,

    "q_training_shards" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_toks,
         |         ('0x' || substr(md5('11:' || doc_id), 1, 15))::BIGINT % $NumShards AS shard,
         |         ('0x' || substr(md5('12:' || doc_id), 1, 15))::BIGINT AS ord
         |  FROM documents
         |)
         |SELECT shard, count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
         |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY ord, doc_id)) AS order_fp
         |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    "q_zipf_fit" ->
      s"""WITH $tokCte,
         |v AS (
         |  SELECT tok, count(*) AS tf
         |  FROM (SELECT unnest(toks) AS tok FROM tok) GROUP BY tok
         |),
         |h AS (SELECT tok, tf FROM v ORDER BY tf DESC, tok LIMIT $ZipfHead),
         |xy AS (
         |  SELECT ln(row_number() OVER (ORDER BY tf DESC, tok)) AS x,
         |         ln(tf) AS y
         |  FROM h
         |)
         |SELECT count(*) AS n_terms,
         |  round(regr_slope(y, x), 6) AS slope,
         |  round(regr_intercept(y, x), 4) AS intercept,
         |  round(regr_r2(y, x), 6) AS r2
         |FROM xy""".stripMargin,

    "q_bigram_ppl" ->
      s"""WITH $tokCte,
         |t AS (
         |  SELECT doc_id, lang, unnest(toks) AS cur,
         |         unnest(range(len(toks))) AS pos
         |  FROM tok
         |),
         |u AS (SELECT cur AS tok, count(*) AS c1 FROM t GROUP BY cur),
         |tt AS (SELECT sum(c1)::DOUBLE AS tot FROM u),
         |b AS (
         |  SELECT doc_id, lang, pos, cur,
         |         lag(cur) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM t
         |),
         |c2 AS (
         |  SELECT prev, cur, count(*) AS c2 FROM b
         |  WHERE prev IS NOT NULL GROUP BY prev, cur
         |),
         |sc AS (
         |  SELECT b.doc_id, b.lang,
         |    CASE WHEN b.prev IS NULL THEN uc.c1 / tt.tot
         |         ELSE $BigramLambda::DOUBLE * coalesce(c2.c2, 0) / up.c1
         |            + ${1 - BigramLambda}::DOUBLE * uc.c1 / tt.tot END AS p
         |  FROM b
         |  JOIN u uc ON uc.tok = b.cur
         |  LEFT JOIN u up ON up.tok = b.prev
         |  LEFT JOIN c2 ON c2.prev = b.prev AND c2.cur = b.cur
         |  CROSS JOIN tt
         |)
         |SELECT doc_id, lang, count(*) AS n_toks,
         |  round(avg(-ln(p)), 6) AS avg_nll,
         |  round(exp(avg(-ln(p))), 6) AS ppl,
         |  (round(avg(-ln(p)), 6) <= $BigramMaxAvgNll) AS keep
         |FROM sc GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    "q_token_budget" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_toks,
         |         ('0x' || substr(md5('21:' || doc_id), 1, 15))::BIGINT AS ord
         |  FROM documents
         |),
         |w AS (
         |  SELECT source, n_toks,
         |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      < $TokenBudget AS kept
         |  FROM d
         |)
         |SELECT source, count(*) AS n_docs,
         |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  sum(CASE WHEN kept THEN n_toks ELSE 0 END)::BIGINT AS kept_tokens
         |FROM w GROUP BY source ORDER BY source""".stripMargin,

    "q_unigram_ppl" ->
      s"""WITH $tokCte,
         |t AS (SELECT doc_id, lang, unnest(toks) AS tok FROM tok),
         |v AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok),
         |tot AS (SELECT ln(sum(tf)) AS ln_total FROM v),
         |sc AS (
         |  SELECT doc_id, lang, count(*) AS n_toks,
         |         max(ln_total) - avg(ln(tf)) AS nll
         |  FROM t JOIN v USING (tok) CROSS JOIN tot
         |  GROUP BY doc_id, lang
         |)
         |SELECT doc_id, lang, n_toks,
         |  round(nll, 6) AS avg_nll,
         |  round(exp(nll), 6) AS ppl,
         |  (round(nll, 6) <= $PplMaxAvgNll) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_pagerank_sim_graph" -> {
      // unrolled power iterations: r1..r5 each re-derive from the
      // previous CTE — deterministic, so the only cross-engine delta is
      // float summation order, absorbed by the final 6-decimal round
      val iters = (1 to PrIters).map { i =>
        s"""r$i AS (
           |  SELECT e.b AS d,
           |         ${1.0 - PrDamping}/nn.n + $PrDamping * sum(p.r / deg.deg) AS r
           |  FROM edges e
           |  JOIN r${i - 1} p ON e.a = p.d
           |  JOIN deg ON e.a = deg.d, nn
           |  GROUP BY e.b, nn.n
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $tokCte, $shgCte, $shfCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
         |),
         |${jacSql("cand", "shf")},
         |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jac >= $PrJaccardThreshold),
         |nodes AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |deg AS (SELECT a AS d, count(*) AS deg FROM edges GROUP BY a),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT d, 1.0/nn.n AS r FROM nodes, nn),
         |$iters
         |SELECT d AS doc_id, round(r, 6) AS pr FROM r$PrIters
         |ORDER BY doc_id""".stripMargin
    },

    "q_dup_span_coverage" ->
      s"""WITH $tokCte,
         |sp AS (
         |  SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+$SpanN], ' ') AS s
         |  FROM tok, unnest(range(0, len(toks)-${SpanN - 1})) AS u(i)
         |),
         |df AS (SELECT s FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT pos) AS dup_spans,
         |         count(DISTINCT p) AS covered_toks
         |  FROM (SELECT doc_id, pos FROM sp JOIN df USING (s)),
         |       unnest(generate_series(pos, pos+${SpanN - 1})) AS g(p)
         |  GROUP BY doc_id
         |),
         |base AS (
         |  SELECT doc_id, len(toks) AS n_toks,
         |         greatest(len(toks) - ${SpanN - 1}, 0) AS n_spans
         |  FROM tok
         |)
         |SELECT base.doc_id, n_toks::BIGINT AS n_toks, n_spans::BIGINT AS n_spans,
         |  coalesce(dup_spans, 0)::BIGINT AS dup_spans,
         |  coalesce(covered_toks, 0)::BIGINT AS covered_toks,
         |  round(coalesce(covered_toks, 0)::DOUBLE / n_toks, 6) AS coverage,
         |  (round(coalesce(covered_toks, 0)::DOUBLE / n_toks, 6) <= $DupCoverageMax) AS keep
         |FROM base LEFT JOIN cov ON base.doc_id = cov.doc_id
         |ORDER BY base.doc_id""".stripMargin,

    "q_pii_redact" -> {
      val lexRe = s"\\b(${PiiLexicon.mkString("|")})\\b"
      s"""WITH red AS (
         |  SELECT doc_id, text,
         |         regexp_replace(regexp_replace(text, '$EmailRegex', '[EMAIL]', 'g'),
         |                        '$lexRe', '[PII]', 'g') AS redacted
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$EmailRegex'))::BIGINT AS n_email,
         |  len(regexp_extract_all(text, '$lexRe'))::BIGINT AS n_lexicon,
         |  len(text)::BIGINT AS n_chars_raw,
         |  len(redacted)::BIGINT AS n_chars_redacted,
         |  ('0x' || substr(md5('0:' || redacted), 1, 15))::BIGINT AS redacted_fp
         |FROM red ORDER BY doc_id""".stripMargin
    },

    "q_dsir_weights" ->
      s"""WITH $tokCte,
         |t AS (SELECT doc_id, lang, unnest(toks) AS w FROM tok),
         |v AS (SELECT w, count(*) AS tf_r,
         |             count(*) FILTER (lang = 'en') AS tf_t
         |      FROM t GROUP BY w),
         |tot AS (SELECT sum(tf_r) AS nr, sum(tf_t) AS nt, count(*) AS vsz FROM v),
         |sc AS (
         |  SELECT doc_id, lang, count(*) AS n_toks,
         |    round(avg(ln((tf_t + 1.0)/(nt + vsz)) - ln((tf_r + 1.0)/(nr + vsz))), 6)
         |      AS avg_log_ratio
         |  FROM t JOIN v USING (w) CROSS JOIN tot
         |  GROUP BY doc_id, lang
         |)
         |SELECT doc_id, lang, n_toks, avg_log_ratio,
         |  (avg_log_ratio > $DsirMinAvgLogRatio) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin
  )
}
