package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A STORED lexical retrieval index — the serving form of the BM25 /
  * sparse dot-product queries (graft.queries.RetrievalQueries): the
  * per-(doc, term) score tables are computed ONCE over the corpus and
  * persisted, and query serving joins the stored postings instead of
  * re-running the tokenize→tf→df pipeline per call (at 100 TB the
  * rebuild is a full corpus pass; the stored table is an inverted
  * index probed by the query's terms only).
  *
  * Layout at `path`:
  *   - `sparse`  (doc_id, term, w): w = round(tf · ln(N/df), 6) — the
  *     SPLADE-shape weights `q_sparse_dot_topk` dots;
  *   - `bm25`    (doc_id, term, tscore): the BM25 partial scores
  *     `q_bm25_topk` sums (score(q,d) = Σ_{t∈q} tscore(t,d));
  *   - `stats`   (term, df) and `meta` (n, avgdl): the FROZEN corpus
  *     statistics both tables were computed against.
  *
  * LSM legs (shared [[graft.ann.LsmStore]] machinery — seq-stamped
  * logs, persistent sequence, compaction fence, crash-safe commit):
  * arriving docs are encoded map-side against the FROZEN stats and
  * appended to `sparse_delta`/`bm25_delta`; deletes append to the
  * `tombstones` log (a tombstone kills rows of its doc_id from
  * strictly earlier batches — same-batch delete+arrival is an upsert);
  * [[sparse]]/[[bm25]] assemble the serving views; every
  * `compactEvery` batches [[compactNow]] folds the logs into the base
  * through the temp-dir + pre-commit-marker protocol.
  *
  * FROZEN-df staleness (the lexical analog of embedding drift): an
  * appended doc's weights use the fit-time N, df, and avgdl — its own
  * terms do not bump df, and terms UNSEEN at fit time get no posting
  * at all (they would need a df that doesn't exist; dropping them
  * under-scores the doc on exactly those terms, never over-scores).
  * Both effects grow with distribution drift, so [[onBatch]] measures
  * each arrival batch's out-of-vocabulary posting ratio
  * ([[lastOovRatio]]) and warns past `oovWatermark` — the
  * DriftCheck-pattern watermark whose prescribed action is refit
  * ([[PostingsStore.build]] again); compaction never re-derives df.
  */
final class PostingsStore(
    spark: SparkSession,
    path: String,
    compactEvery: Int,
    k1: Double = PostingsStore.K1,
    b: Double = PostingsStore.B,
    oovWatermark: Double = 0.0) extends graft.ann.LsmStore {

  require(compactEvery > 0, s"compactEvery $compactEvery must be positive")

  private val logr = org.slf4j.LoggerFactory.getLogger(getClass)

  override protected def lsmSpark: SparkSession = spark
  override protected def lsmPath: String = path
  override protected def lsmLogDirs: Seq[String] =
    Seq("sparse_delta", "bm25_delta", "tombstones", "batch_commits")

  private var batches = recoverSeq()

  /** OOV posting ratio of the most recent batch's ARRIVALS (None until
    * a batch with arrivals has run) — the fraction of the batch's
    * (doc, term) rows whose term the frozen vocabulary lacks. */
  @volatile var lastOovRatio: Option[Double] = None

  def batchesSeen: Int = batches
  /** Cadence measured from the LAST compaction (the fence), not seq
    * divisibility — a failed attempt burns its seq, and a burned
    * multiple must defer the fold by one batch, not a whole cycle. */
  def compactionDue: Boolean = (batches + 1) - readFence() >= compactEvery

  private def emptySeqDocs: DataFrame =
    spark.range(0).select(col("id").as("doc_id"), lit(0).as("seq"))

  private def tombstones: DataFrame =
    visibleFilter(readOr("tombstones", emptySeqDocs))
      .select("doc_id", "seq")

  private def liveView(baseSub: String): DataFrame = {
    val base = spark.read.parquet(s"$path/$baseSub").withColumn("seq", lit(0))
    val all = base.unionByName(
      visibleFilter(readOr(s"${baseSub}_delta", base.limit(0))))
    val t = broadcast(tombstones)
    all.join(t, all("doc_id") === t("doc_id") && t("seq") > all("seq"),
        "left_anti")
      .drop("seq")
  }

  /** The serving views — probe them by term exactly like the inline
    * pipelines' frames (RetrievalSpec pins row-identity on the base). */
  def sparse: DataFrame = liveView("sparse")
  def bm25: DataFrame = liveView("bm25")

  private def stats: DataFrame = spark.read.parquet(s"$path/stats")
  private def meta: (Long, Double) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Long]("n"), r.getAs[Double]("avgdl"))
  }

  /** One maintenance step. `arrivals` rows are (doc_id, toks
    * ARRAY<STRING>); `deletes` rows are (doc_id). An id in both is an
    * upsert. Arrivals encode against the FROZEN stats (class doc). */
  def onBatch(arrivals: Option[DataFrame],
              deletes: Option[DataFrame]): Unit = {
    guardPoisoned()
    val seq = batches + 1
    // the seq is BURNED up front: a failed attempt's partial log rows
    // stay at a seq no retry reuses (LsmStore doc)
    batches = seq
    arrivals.foreach { a =>
      val (n, avgdl) = meta
      val tf = a.select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .persist()
      try {
      val known = tf.join(broadcast(stats), "term")
      // staleness watermark: OOV fraction of this batch's postings
      val agg = tf.agg(count(lit(1)).as("total")).crossJoin(
        known.agg(count(lit(1)).as("known"))).head()
      val total = agg.getAs[Long]("total")
      val oov = if (total == 0) 0.0
        else 1.0 - agg.getAs[Long]("known").toDouble / total
      lastOovRatio = Some(oov)
      if (oovWatermark > 0 && oov > oovWatermark) logr.warn(
        f"stored postings '$path' batch $seq arrivals are $oov%.2f OOV " +
          f"vs the frozen vocabulary (watermark $oovWatermark): the " +
          "frozen df stats no longer describe the corpus — unseen terms " +
          "get NO postings (docs under-score on them) and df for known " +
          "terms is stale. Refit (PostingsStore.build); compaction " +
          "never re-derives df.")
      known.select(col("doc_id"), col("term"),
          PostingsStore.sparseWCol(n.toDouble).as("w"),
          lit(seq).as("seq"))
        .write.mode("append").parquet(s"$path/sparse_delta")
      known.select(col("doc_id"), col("term"),
          PostingsStore.tscoreCol(n.toDouble, k1, b, lit(avgdl)).as("tscore"),
          lit(seq).as("seq"))
        .write.mode("append").parquet(s"$path/bm25_delta")
      // finally: the burn-and-retry contract makes the failure path an
      // expected flow — a leaked cached RDD per failed attempt would
      // accumulate across retries
      } finally tf.unpersist(false)
    }
    deletes.foreach(_.select(col("doc_id"), lit(seq).as("seq"))
      .write.mode("append").parquet(s"$path/tombstones"))
    // atomic visibility: a crash above leaves a partial batch (sparse
    // written, bm25 not — or a delete without its upsert arrival) that
    // visibleFilter ignores instead of serving diverged views
    markBatchCommitted(seq)
    if (batches - readFence() >= compactEvery) compactNow()
  }

  /** Fold the logs into both base tables through the crash-safe
    * temp-dir + pre-commit-marker commit. The frozen stats/meta are
    * untouched — compaction folds rows, never re-derives df. */
  def compactNow(): Unit = {
    sparse.localCheckpoint().write.mode("overwrite")
      .parquet(s"$path/$CompactTmpDir/sparse")
    bm25.localCheckpoint().write.mode("overwrite")
      .parquet(s"$path/$CompactTmpDir/bm25")
    commitCompaction(batches, Seq(
      s"$CompactTmpDir/sparse" -> "sparse",
      s"$CompactTmpDir/bm25" -> "bm25"))
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
  // shares (RetrievalQueries' inline termScores/sparseWeights, build,
  // and the frozen-stats append). Bit-identity across them is the
  // store's contract, and these formulas must not exist in
  // hand-synchronized copies: a one-sided tweak (k1/b handling, the
  // log(1+x)-vs-log1p ulp, rounding) would silently break row-identity
  // for exactly one path. Inputs are columns named df/tf/dl.

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

  /** Compute both postings tables + the frozen stats over `docs`
    * ((doc_id, toks)) and persist them at `path`; returns a store
    * serving them. The expressions mirror RetrievalQueries.termScores /
    * sparseWeights term-for-term so the stored tables are row-identical
    * to the inline pipelines' frames (pinned in RetrievalSpec) — a
    * serving swap must change plans, not numbers. */
  def build(spark: SparkSession, path: String, docs: DataFrame,
            compactEvery: Int = 1000, k1: Double = K1, b: Double = B,
            oovWatermark: Double = 0.0): PostingsStore = {
    val d = docs.select(col("doc_id"), col("toks"))
    val n = d.count()
    val exploded = d.select(col("doc_id"), size(col("toks")).as("dl"),
      explode(col("toks")).as("term"))
    val tf = exploded.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .persist()
    tf.count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdlRow = d.agg(avg(size(col("toks"))).as("avgdl"))
    val avgdl = avgdlRow.head().getDouble(0)
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(avgdlRow))
      .select(col("doc_id"), col("term"),
        tscoreCol(n.toDouble, k1, b, col("avgdl")).as("tscore"))
      .write.mode("overwrite").parquet(s"$path/bm25")
    tf.join(broadcast(dfreq), "term")
      .select(col("doc_id"), col("term"),
        sparseWCol(n.toDouble).as("w"))
      .write.mode("overwrite").parquet(s"$path/sparse")
    dfreq.write.mode("overwrite").parquet(s"$path/stats")
    tf.unpersist(false)
    import spark.implicits._
    Seq((n, avgdl)).toDF("n", "avgdl")
      .write.mode("overwrite").parquet(s"$path/meta")
    new PostingsStore(spark, path, compactEvery, k1, b, oovWatermark)
  }
}
