package graft.retrieval

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A STORED lexical retrieval index — the serving form of the BM25 /
  * sparse dot-product queries (graft.queries.RetrievalQueries): the
  * per-(doc, term) postings are computed ONCE over the corpus and
  * persisted, and query serving joins the stored postings instead of
  * re-running the tokenize→tf→df pipeline per call (at 100 TB the
  * rebuild is a full corpus pass; the stored table is an inverted
  * index probed by the query's terms only).
  *
  * Layout at `path` (the RAW-postings layout — scores are derived at
  * probe time, which is what makes the stats refit O(drift)):
  *   - `tfs`     (doc_id, term, tf, dl, seq): raw term frequencies +
  *     doc length. `seq` survives compaction — [[mergeRefit]]'s fence
  *     arithmetic needs to know which rows the stats already cover;
  *   - `doclens` (doc_id, dl, seq): one row per DOC (including
  *     token-less docs, which have no `tfs` rows but still count in
  *     N/avgdl) — the BM25 doc-length sidecar the n/avgdl fold reads
  *     without touching the postings table;
  *   - `stats`   (term, df) and `meta` (n, avgdl, tdl, stats_seq): the
  *     corpus statistics as of the STATS FENCE (the log seq through
  *     which arrivals/deletes are folded into them — embedded in meta
  *     as `stats_seq` AND cached in the `_stats_fence` marker).
  *     `tdl` (total doc length, a long) makes the avgdl fold exact:
  *     avgdl = tdl/n in both build and refit, bit-equal to the inline
  *     pipelines' double-sum avg() for any corpus whose token total
  *     fits 2^53 (and MORE exact past it);
  *   - LSM logs (shared [[graft.ann.LsmStore]] machinery): `tfs_delta`,
  *     `doclens_delta`, `tombstones`, `batch_commits`.
  *
  * Serving ([[sparse]]/[[bm25]]) computes w/tscore at probe time:
  * live rows ⨝ broadcast(stats) with the canonical expressions below —
  * map-side codegen over exactly the rows the query's terms probe, so
  * the serve cost is unchanged from the precomputed-score layout while
  * the stored rows become stats-independent. That independence is the
  * point: an arrival whose terms were unseen at fit time stores its
  * raw rows anyway (they simply don't score until a refit gives the
  * terms a df — under-scoring, never over-scoring), and a stats refit
  * retroactively re-scores EVERYTHING without rewriting a posting.
  *
  * FROZEN-df staleness (the lexical analog of embedding drift): between
  * refits, serving uses the fence-time N, df, avgdl. [[onBatch]]
  * measures each arrival batch's out-of-vocabulary posting ratio
  * ([[lastOovRatio]]) and warns past `oovWatermark` — and the remedy is
  * now [[mergeRefit]], which folds the DRIFT (arrivals since the stats
  * fence; deletes of fenced docs) into stats/meta in O(drift), not a
  * full corpus rebuild: df increments come from the delta rows
  * themselves, decrements from the dead docs' stored rows (probed by
  * doc_id, bounded output), n/avgdl from the doc-length sidecar.
  * Post-refit serving is row-identical to a full
  * [[PostingsStore.build]] over the drifted corpus (spec-pinned).
  *
  * [[compactNow]] folds the logs into the base through the crash-safe
  * temp-dir + pre-commit-marker protocol, running [[mergeRefit]] FIRST
  * — the row fold physically applies tombstones and drops the logs,
  * which are exactly the inputs the stats fold needs — so a compacted
  * store's stats always describe its live corpus (post-compaction
  * serving == a fresh build's, the strongest identity on offer).
  * Serving scores therefore change only at refit/compaction
  * boundaries, never mid-window.
  */
final class PostingsStore(
    spark: SparkSession,
    path: String,
    compactEvery: Int = graft.ann.LsmStore.DefaultCompactEvery,
    k1: Double = PostingsStore.K1,
    b: Double = PostingsStore.B,
    oovWatermark: Double = 0.0) extends graft.ann.LsmStore {

  require(compactEvery > 0, s"compactEvery $compactEvery must be positive")

  private val logr = org.slf4j.LoggerFactory.getLogger(getClass)

  override protected def lsmSpark: SparkSession = spark
  override protected def lsmPath: String = path
  override protected def lsmLogDirs: Seq[String] =
    Seq("tfs_delta", "doclens_delta", "tombstones", "batch_commits")

  // a v1 store (precomputed sparse/bm25 tables, no raw rows) cannot be
  // upgraded in place — its tf/dl inputs were never persisted
  require(!(lsmFs.exists(new Path(s"$path/sparse")) &&
      !lsmFs.exists(new Path(s"$path/tfs"))),
    s"postings store at '$path' uses the pre-raw-postings layout " +
      "(precomputed sparse/bm25, raw tf rows never persisted) — " +
      "rebuild it with PostingsStore.build")

  // the stats fence joins the recovery max (the GraphMaintainer scope-
  // fence rule): a seq burned by a failed batch can reach the fence via
  // mergeRefit with NO log row carrying it — recovery from the logs
  // alone would reuse it, and the reused batch's rows would sit
  // at-or-below the fence, permanently excluded from every stats fold
  private var batches = { recoverRefit(); math.max(recoverSeq(), statsFence) }

  /** OOV posting ratio of the most recent batch's ARRIVALS (None until
    * a batch with arrivals has run) — the fraction of the batch's
    * (doc, term) rows whose term the fence-time vocabulary lacks. */
  @volatile var lastOovRatio: Option[Double] = None

  def batchesSeen: Int = batches
  /** Cadence measured from the LAST compaction (the fence), not seq
    * divisibility — a failed attempt burns its seq, and a burned
    * multiple must defer the fold by one batch, not a whole cycle. */
  def compactionDue: Boolean = (batches + 1) - readFence() >= compactEvery

  private def emptySeqDocs: DataFrame =
    spark.range(0).select(col("id").as("doc_id"), lit(0).as("seq"))

  private def tombstonesAll: DataFrame =
    visibleFilter(readOr("tombstones", emptySeqDocs)).select("doc_id", "seq")

  /** The LSM kill rule on a seq-carrying row table: a tombstone kills
    * rows of its doc from STRICTLY earlier seqs (same-batch
    * delete+arrival is an upsert; a later re-insert revives). */
  private def killDead(all: DataFrame): DataFrame = {
    val t = broadcast(tombstonesAll
      .select(col("doc_id").as("t_doc"), col("seq").as("tseq")))
    all.join(t, all("doc_id") === col("t_doc") && col("tseq") > all("seq"),
      "left_anti")
  }

  private def withDelta(baseSub: String): DataFrame = {
    val base = spark.read.parquet(s"$path/$baseSub")
    base.unionByName(visibleFilter(readOr(s"${baseSub}_delta", base.limit(0))))
  }

  /** Live raw postings (doc_id, term, tf, dl, seq). */
  private[retrieval] def liveTfs: DataFrame = killDead(withDelta("tfs"))
  /** Live doc-length sidecar (doc_id, dl, seq) — one row per live doc. */
  private[retrieval] def liveDoclens: DataFrame = killDead(withDelta("doclens"))

  /** The live DOCUMENT set (doc_id, dl) — membership, not scoring: a
    * freshly-appended doc whose terms are all OOV since the stats
    * fence is LIVE here even though [[sparse]]/[[bm25]] won't score it
    * until a refit (the under-score-never-over-score rule). The view
    * composed pipelines and specs check store membership against. */
  def liveDocs: DataFrame = liveDoclens.select(col("doc_id"), col("dl"))

  private def stats: DataFrame = spark.read.parquet(s"$path/stats")
  private def meta: (Long, Double, Long) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Long]("n"), r.getAs[Double]("avgdl"), r.getAs[Long]("tdl"))
  }

  /** The serving views — probe them by term exactly like the inline
    * pipelines' frames (RetrievalSpec pins row-identity): scores derive
    * map-side from the probed raw rows × the broadcast fence-time
    * stats. Terms absent from stats (OOV since the fence) don't score
    * until a refit — the under-score-never-over-score rule. */
  def sparse: DataFrame = {
    val (n, _, _) = meta
    liveTfs.join(broadcast(stats), "term")
      .select(col("doc_id"), col("term"),
        PostingsStore.sparseWCol(n.toDouble).as("w"))
  }
  def bm25: DataFrame = {
    val (n, avgdl, _) = meta
    liveTfs.join(broadcast(stats), "term")
      .select(col("doc_id"), col("term"),
        PostingsStore.tscoreCol(n.toDouble, k1, b, lit(avgdl)).as("tscore"))
  }

  /** One maintenance step. `arrivals` rows are (doc_id, toks
    * ARRAY<STRING>); `deletes` rows are (doc_id). An id in both is an
    * upsert. Arrivals store RAW rows (stats-independent — class doc). */
  def onBatch(arrivals: Option[DataFrame],
              deletes: Option[DataFrame]): Unit = {
    guardPoisoned()
    val seq = batches + 1
    // the seq is BURNED up front: a failed attempt's partial log rows
    // stay at a seq no retry reuses (LsmStore doc)
    batches = seq
    arrivals.foreach { a =>
      val tf = a.select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .persist()
      try {
        // staleness watermark: OOV fraction of this batch's postings vs
        // the fence-time vocabulary
        val agg = tf.agg(count(lit(1)).as("total")).crossJoin(
          tf.join(broadcast(stats), "term")
            .agg(count(lit(1)).as("known"))).head()
        val total = agg.getAs[Long]("total")
        val oov = if (total == 0) 0.0
          else 1.0 - agg.getAs[Long]("known").toDouble / total
        lastOovRatio = Some(oov)
        if (oovWatermark > 0 && oov > oovWatermark) logr.warn(
          f"stored postings '$path' batch $seq arrivals are $oov%.2f OOV " +
            f"vs the fence-time vocabulary (watermark $oovWatermark): the " +
            "frozen df stats no longer describe the corpus — unseen terms " +
            "score NOTHING until a refit and df for known terms is stale. " +
            "Run mergeRefit(): it folds the drift into the stats in " +
            "O(drift) and the stored raw rows re-score retroactively.")
        tf.select(col("doc_id"), col("term"), col("tf"), col("dl"),
            lit(seq).as("seq"))
          .write.mode("append").parquet(s"$path/tfs_delta")
        a.select(col("doc_id"), size(col("toks")).as("dl"),
            lit(seq).as("seq"))
          .write.mode("append").parquet(s"$path/doclens_delta")
      // finally: the burn-and-retry contract makes the failure path an
      // expected flow — a leaked cached RDD per failed attempt would
      // accumulate across retries
      } finally tf.unpersist(false)
    }
    deletes.foreach(_.select(col("doc_id"), lit(seq).as("seq"))
      .write.mode("append").parquet(s"$path/tombstones"))
    // atomic visibility: a crash above leaves a partial batch (tfs
    // written, doclens not — or a delete without its upsert arrival)
    // that visibleFilter ignores instead of serving diverged views
    markBatchCommitted(seq)
    if (batches - readFence() >= compactEvery) compactNow()
  }

  // ---- O(drift) stats refit ----

  /** Log seq through which arrivals/deletes are folded into stats/meta
    * (0 = fit-time only) — read as max(the `_stats_fence` marker, the
    * `stats_seq` column embedded in meta since round 14). The embedded
    * copy makes marker loss recoverable: it is written in the SAME
    * crash-safe commit as the stats it fences, so the two cannot
    * diverge destructively (see the body comment for the one benign
    * divergence). For a pre-stats_seq store whose marker is lost, the
    * [[mergeRefit]] fence-0 cross-check (meta.n vs the persisted seq≤0
    * doc count) still refuses the doc-count-changing cases loudly;
    * count-neutral drift (same-length upserts) on such a store is the
    * residual documented gap — rebuild closes it. */
  private def markerFence: Int =
    try readMarker("_stats_fence").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).getOrElse(0)
    catch { case _: Exception => 0 }

  private def statsFence: Int = {
    val marker = markerFence
    // meta's embedded copy (absent on pre-round-14 stores) is the
    // durable one — it swapped WITH the stats it fences, so it can
    // only be lost by losing the stats themselves. max() is safe in
    // the one divergence case (marker ahead after a no-drift advance,
    // which rewrites no meta): the skipped window had zero moves, so
    // re-scanning it from the meta fence would fold nothing anyway.
    val embedded =
      try {
        val df = spark.read.parquet(s"$path/meta")
        if (df.schema.fieldNames.contains("stats_seq"))
          df.head().getAs[Int]("stats_seq")
        else 0
      } catch { case _: Exception => 0 }
    math.max(marker, embedded)
  }

  private def refitMarkerPath = new Path(s"$path/_postings_refit")
  // a def, NOT a val: recoverRefit runs during construction (the
  // `batches` initializer), before later vals initialize — a val here
  // would read as null inside the recovery path and silently skip the
  // renames (found the hard way)
  private def RefitTmpDir = "_refit_tmp"

  /** The destructive half of the refit commit — idempotent: renames
    * skipped when the temp is gone, the stats fence write is monotone,
    * the temp/marker deletes are no-ops when done. */
  private def finishRefit(newFence: Int): Unit = {
    Seq("stats", "meta").foreach { sub =>
      val tp = new Path(s"$path/$RefitTmpDir/$sub")
      val fp = new Path(s"$path/$sub")
      if (lsmFs.exists(tp)) {
        require(!lsmFs.exists(fp) || lsmFs.delete(fp, true),
          s"postings store '$path': failed to clear '$sub' for the " +
            "refit swap — marker and temp kept; reopen retries")
        require(lsmFs.rename(tp, fp),
          s"postings store '$path': failed to swap refit '$sub' — " +
            "marker and temp kept; reopen retries")
      }
    }
    // compared against the MARKER's own value, not the combined fence:
    // the swap above already advanced the embedded copy, and the
    // marker cache must still be (re)published for the no-drift
    // advance path (which never rewrites meta) to build on
    if (markerFence < newFence)
      publishMarker("_stats_fence", newFence.toString)
    lsmFs.delete(new Path(s"$path/$RefitTmpDir"), true)
    lsmFs.delete(refitMarkerPath, false)
  }

  /** Detect and finish a refit that crashed mid-commit (the
    * [[graft.ann.LsmStore.recoverCompaction]] pattern: a parseable
    * marker means the new stats/meta are fully written and every
    * remaining step is deterministic; a garbled one means the
    * publishing process crashed pre-content — nothing destructive ran,
    * so the aborted refit just retries later). */
  private def recoverRefit(): Unit = {
    val body = readMarker("_postings_refit").getOrElse(return)
    body.trim.toIntOption match {
      case Some(f) =>
        logr.warn(s"postings store '$path': found a refit marker " +
          s"(stats fence $f) — a previous process crashed mid-commit; " +
          "finishing the commit (swap stats/meta, advance the fence).")
        poisonOnFailure(finishRefit(f))
      case None =>
        logr.warn(s"postings store '$path': the refit marker at " +
          s"$refitMarkerPath is unparseable (body '${body.take(40)}') — " +
          "pre-content crash, nothing destructive ran; discarding the " +
          "aborted refit's marker and temps.")
        lsmFs.delete(refitMarkerPath, false)
        lsmFs.delete(new Path(s"$path/$RefitTmpDir"), true)
    }
  }

  /** Fold the drift since the stats fence into stats/meta — O(drift),
    * never a corpus pass: df increments from the delta rows themselves
    * (arrivals carry their own (doc, term) rows), df decrements from
    * the dead fenced docs' stored rows (a bounded-output probe of the
    * postings by tombstoned doc_id), n/tdl/avgdl from the doc-length
    * sidecar. Post-refit serving is row-identical to a full
    * [[PostingsStore.build]] over the drifted corpus
    * (PostingsStoreSpec pins it), and previously-OOV stored rows begin
    * scoring retroactively. Crash-safe: new stats/meta land in a temp
    * dir, a marker commits, recovery finishes at construction. No-op
    * (returns false) when nothing drifted. */
  def mergeRefit(): Boolean = {
    guardPoisoned()
    val sf = statsFence
    // fence-0 cross-check (see [[statsFence]]): stats claiming
    // "fit-time only" must agree with the persisted fit-time doc count
    // (build stamps base rows seq 0 and meta.n from them; every later
    // row carries seq ≥ 1). One doc-count-sized scan, paid at most on
    // a store's first refit. With the fence now embedded in meta this
    // guard only fires for PRE-stats_seq stores with a lost marker (or
    // a hand-damaged meta), where it refuses the doc-count-changing
    // double-fold cases loudly.
    if (sf == 0) {
      val fitDocs = withDelta("doclens").where(col("seq") <= 0).count()
      val (n0, _, _) = meta
      require(fitDocs == n0,
        s"postings store '$path': stats fence reads 0 (fit-time only) " +
          s"but meta.n=$n0 differs from the seq<=0 doc count $fitDocs — " +
          "the `_stats_fence` marker was likely lost or corrupted after " +
          "a refit/compaction; folding from 0 would double-count " +
          "already-folded rows. Rebuild (PostingsStore.build).")
    }
    val newFence = batches
    val tombs = tombstonesAll.persist()
    try {
      val newT = broadcast(tombs.where(col("seq") > sf)
        .select(col("doc_id").as("t_doc"), col("seq").as("tseq")))
      val oldT = broadcast(tombs.where(col("seq") <= sf)
        .select(col("doc_id").as("t_doc"), col("seq").as("tseq")))
      // fenced rows that died SINCE the fence: counted in stats, must
      // decrement. Rows already dead AT the fence were decremented by
      // the refit that advanced it (or physically dropped by
      // compaction) — the old-tombstone anti-join keeps them out.
      def deadOld(all: DataFrame): DataFrame = all
        .where(col("seq") <= sf)
        .join(oldT, all("doc_id") === oldT("t_doc") &&
          oldT("tseq") > all("seq"), "left_anti")
        .join(newT, all("doc_id") === newT("t_doc") &&
          newT("tseq") > all("seq"), "left_semi")
      val deadTf = deadOld(withDelta("tfs"))
      val deadDl = deadOld(withDelta("doclens"))
      // live rows the stats don't cover yet (arrivals since the fence;
      // an upserted doc's surviving version)
      val freshTf = liveTfs.where(col("seq") > sf)
      val freshDl = liveDoclens.where(col("seq") > sf)

      val dlMoves = freshDl.select(lit(1L).as("dn"), col("dl").cast("long"))
        .withColumn("sgn", lit(1L))
        .unionByName(deadDl.select(lit(1L).as("dn"),
          col("dl").cast("long")).withColumn("sgn", lit(-1L)))
        .agg(coalesce(sum(col("sgn") * col("dn")), lit(0L)).as("dN"),
          coalesce(sum(col("sgn") * col("dl")), lit(0L)).as("dTdl"))
        .head()
      val dN = dlMoves.getLong(0)
      val dTdl = dlMoves.getLong(1)
      val dfMoves = freshTf.select(col("term"), lit(1L).as("d"))
        .unionByName(deadTf.select(col("term"), lit(-1L).as("d")))
        .groupBy("term").agg(sum("d").as("ddf"))
        .where(col("ddf") =!= 0L)
        .persist()
      // try/finally like onBatch's tf: the negative-fold require below
      // is an EXPECTED error path (corrupt fence), and repeated retries
      // against it must not accumulate cached RDDs
      try {
      val nMoved = dfMoves.count()
      if (dN == 0L && dTdl == 0L && nMoved == 0L) {
        // nothing drifted — still advance the fence so later folds
        // don't rescan this window
        if (newFence > sf) publishMarker("_stats_fence", newFence.toString)
        return false
      }
      val (n, _, tdl) = meta
      val n2 = n + dN
      val tdl2 = tdl + dTdl
      require(n2 >= 0 && tdl2 >= 0,
        s"postings store '$path': refit fold went negative (n=$n2, " +
          s"tdl=$tdl2) — stats fence and logs disagree; rebuild " +
          "(PostingsStore.build)")
      val merged = stats
        .join(dfMoves, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("ddf"), lit(0L)))
            .as("df"))
        .where(col("df") > 0L)
      merged.localCheckpoint()
        .write.mode("overwrite").parquet(s"$path/$RefitTmpDir/stats")
      import spark.implicits._
      // the fence travels INSIDE meta (stats_seq): meta swaps in the
      // same commit as the stats it describes, so a lost/corrupt
      // `_stats_fence` marker is recovered from the store itself —
      // see [[statsFence]]
      Seq((n2, if (n2 == 0L) 0.0 else tdl2.toDouble / n2, tdl2,
          newFence))
        .toDF("n", "avgdl", "tdl", "stats_seq")
        .write.mode("overwrite").parquet(s"$path/$RefitTmpDir/meta")
      publishMarker("_postings_refit", newFence.toString)
      poisonOnFailure(finishRefit(newFence))
      if (logr.isInfoEnabled) logr.info(
        s"stored postings '$path' stats refit: folded drift through " +
          s"seq $newFence ($nMoved terms, $dN docs)")
      true
      } finally dfMoves.unpersist(false)
    } finally tombs.unpersist(false)
  }

  /** Fold the logs into the base tables through the crash-safe
    * temp-dir + pre-commit-marker commit — stats first
    * ([[mergeRefit]]; the row fold physically applies the tombstones
    * and drops the logs the stats fold reads), so a compacted store's
    * stats always describe its live corpus. */
  def compactNow(): Unit = {
    guardPoisoned()
    mergeRefit()
    liveTfs.localCheckpoint().write.mode("overwrite")
      .parquet(s"$path/$CompactTmpDir/tfs")
    liveDoclens.localCheckpoint().write.mode("overwrite")
      .parquet(s"$path/$CompactTmpDir/doclens")
    commitCompaction(batches, Seq(
      s"$CompactTmpDir/tfs" -> "tfs",
      s"$CompactTmpDir/doclens" -> "doclens"))
    if (logr.isInfoEnabled) logr.info(
      s"stored postings '$path' compacted after $batches batches")
  }
}

object PostingsStore {
  /** BM25 term-saturation / length-normalization constants (the
    * canonical defaults; RetrievalQueries aliases these). */
  val K1 = 1.2
  val B = 0.75

  // Canonical scoring EXPRESSIONS — the one spelling every consumer
  // shares (RetrievalQueries' inline termScores/sparseWeights and the
  // store's serving views). Bit-identity across them is the store's
  // contract, and these formulas must not exist in hand-synchronized
  // copies: a one-sided tweak (k1/b handling, the log(1+x)-vs-log1p
  // ulp, rounding) would silently break row-identity for exactly one
  // path. Inputs are columns named df/tf/dl.

  /** Lucene-standard BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)). */
  private[graft] def idfCol(n: Double): org.apache.spark.sql.Column =
    log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))

  /** BM25 per-(doc, term) partial score; `avgdl` as a Column so callers
    * pass either the aggregated col("avgdl") or a frozen lit. */
  private[graft] def tscoreCol(n: Double, k1: Double, b: Double,
                               avgdl: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    idfCol(n) * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))

  /** Sparse posting weight: round(tf · ln(N/df), 6). */
  private[graft] def sparseWCol(n: Double): org.apache.spark.sql.Column =
    round(col("tf") * log(lit(n) / col("df")), 6)

  /** Compute the raw postings + doc-length sidecar + stats over `docs`
    * ((doc_id, toks)) and persist them at `path`; returns a store
    * serving them. The serving views mirror RetrievalQueries.termScores
    * / sparseWeights term-for-term so they are row-identical to the
    * inline pipelines' frames (pinned in RetrievalSpec/
    * PostingsStoreSpec) — a serving swap must change plans, not
    * numbers. avgdl is computed as tdl/n (exact long total) — equal to
    * the inline avg()'s double-sum for any corpus under 2^53 total
    * tokens, and exact past it. */
  /** Open a NEW store at `toPath` whose base tables are a FILE-level
    * copy of the store at `fromPath` (the four base subdirs —
    * tfs/doclens/stats/meta; LSM logs are NOT copied, the clone starts
    * with a clean history). The sharing primitive for derived stores:
    * a drifted/refit twin over the same corpus skips the
    * tokenize + tf/df aggregation build entirely (two corpus shuffles
    * for a pure copy — measured ~2× cheaper at sf0.1, SCALE-neutral
    * since both are one pass over the base tables' bytes) and is
    * bit-identical to a fresh build by construction. The source store
    * must be un-batched (its base tables ARE its state); a batched
    * source would silently lose its delta/tombstone logs. */
  def cloneBase(spark: SparkSession, fromPath: String, toPath: String,
                compactEvery: Int = graft.ann.LsmStore.DefaultCompactEvery,
                k1: Double = K1, b: Double = B,
                oovWatermark: Double = 0.0): PostingsStore = {
    val conf = spark.sparkContext.hadoopConfiguration
    val from = new Path(fromPath)
    val to = new Path(toPath)
    val fs = from.getFileSystem(conf)
    fs.delete(to, true)
    fs.mkdirs(to)
    Seq("tfs", "doclens", "stats", "meta").foreach { sub =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(from, sub),
        fs, new Path(to, sub), false, conf)
    }
    new PostingsStore(spark, toPath, compactEvery, k1, b, oovWatermark)
  }

  def build(spark: SparkSession, path: String, docs: DataFrame,
            compactEvery: Int = graft.ann.LsmStore.DefaultCompactEvery,
            k1: Double = K1, b: Double = B,
            oovWatermark: Double = 0.0): PostingsStore = {
    val d = docs.select(col("doc_id"), col("toks"))
    d.select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"),
        lit(0).as("seq"))
      .write.mode("overwrite").parquet(s"$path/tfs")
    d.select(col("doc_id"), size(col("toks")).as("dl"), lit(0).as("seq"))
      .write.mode("overwrite").parquet(s"$path/doclens")
    val stored = spark.read.parquet(s"$path/tfs")
    stored.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/stats")
    val m = spark.read.parquet(s"$path/doclens")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("tdl"))
      .head()
    val n = m.getLong(0)
    val tdl = m.getLong(1)
    import spark.implicits._
    Seq((n, if (n == 0L) 0.0 else tdl.toDouble / n, tdl, 0))
      .toDF("n", "avgdl", "tdl", "stats_seq")
      .write.mode("overwrite").parquet(s"$path/meta")
    new PostingsStore(spark, path, compactEvery, k1, b, oovWatermark)
  }
}
