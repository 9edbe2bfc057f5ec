package graft.ann.lsh

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduled maintenance for a STORED LSH index under streaming
  * upserts/deletes — the LSH twin of [[graft.ann.GraphMaintainer]],
  * organized as a miniature LSM store over the [[LshIndex.save]]
  * layout at `path`:
  *
  *   - appends are DELTAS: arrivals hash through the frozen persisted
  *     forest ([[LshModel.transform]] — map-side) and land in
  *     append-mode parquet under `vectors_delta`/`buckets_delta`,
  *     stamped with the batch sequence number — no existing file is
  *     ever rewritten on the hot path;
  *   - deletes are a TOMBSTONE LOG (`tombstones`, append-only
  *     (vec_id, seq) rows). A tombstone kills rows of that id from
  *     STRICTLY EARLIER batches (base rows are seq 0), so an id in
  *     both `arrivals` and `deletes` of one batch is an UPSERT: the
  *     old row dies, the same-batch arrival survives — the LSM
  *     sequencing that makes [[LshIndex.upsert]] expressible as log
  *     records instead of a view chain;
  *   - [[index]] assembles the serving view: (base ∪ deltas) anti-join
  *     the broadcast tombstone log on (vec_id, t.seq > v.seq) — a
  *     map-side view over an ordinary [[LshIndex]], so search,
  *     filtered search, and candidate-pairs all compose;
  *   - every `compactEvery` batches, [[compactNow]] folds everything
  *     into the base: the live view is materialized (localCheckpoint —
  *     Spark refuses to overwrite files still being read), rewritten
  *     via [[LshIndex.save]], and the delta/tombstone logs are dropped
  *     — bounded log size, one rewrite amortized over N batches;
  *   - between compactions an occupancy watermark warns (loud, cheap,
  *     non-fatal — the [[Lsh.fit]] pattern) when the at-rest row count
  *     (base + delta logs, INCLUDING tombstoned rows, which cost every
  *     probe until compacted out) grows past `occupancyWatermark`× the
  *     base snapshot the frozen forest serves: frozen planes still hash
  *     arrivals correctly, but bucket occupancy — and so per-probe
  *     search cost — inflates by the growth factor. The counts are
  *     tracked incrementally (one base count at first use, += arrivals
  *     per batch), never by re-assembling the serving view; refit, or
  *     serve through [[LshIndex.cappedBuckets]] / `maxCandidates`.
  *
  * Driver-side state is one Int (the batch counter), safe inside
  * `foreachBatch` (runs on the driver); everything heavy is DataFrame
  * jobs. Stream==batch identity is pinned by StreamingLshLifecycleSpec.
  */
final class LshMaintainer(
    spark: SparkSession,
    path: String,
    compactEvery: Int,
    occupancyWatermark: Double = 0.0) {

  require(compactEvery > 0, s"compactEvery $compactEvery must be positive")

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The frozen forest, loaded once — the class contract is that
    * arrivals hash through the PERSISTED model, so re-reading it per
    * micro-batch was pure repeated I/O. Replaced only by [[refitNow]]. */
  private var modelCache: LshModel = null
  private def model: LshModel = {
    if (modelCache == null) modelCache = LshModel.load(spark, s"$path/model")
    modelCache
  }

  /** The LSM sequence is PERSISTENT state: a reconstructed maintainer
    * (driver restart, new session over the same store) must continue
    * the stamp sequence, not restart at 1 — a restarted counter lets an
    * OLD tombstone (higher persisted seq) kill a NEW arrival, and a new
    * delete fail to kill old delta rows. Recovered as max(seq) across
    * the on-disk logs; base rows are seq 0 and compaction clears the
    * logs, so a freshly-compacted store recovers 0. */
  private var batches = {
    val logs = Seq("vectors_delta", "tombstones")
      .map(sub => readOr(sub, emptySeqIds).select("seq"))
      .reduce(_.unionByName(_))
    val m = logs.agg(org.apache.spark.sql.functions.max("seq")).head()
    if (m.isNullAt(0)) 0 else m.getInt(0)
  }

  /** Occupancy-watermark state, tracked incrementally so the per-batch
    * check costs nothing (the old form re-assembled and counted the
    * whole serving view per batch, and measured growth against
    * min(total, sampleCap) — which is 1.0x for any corpus under the
    * cap, so it could never fire). `fitRows` is the base snapshot the
    * frozen forest serves (counted once, lazily); `atRestRows` adds the
    * delta-log rows INCLUDING tombstoned ones — dead rows still sit in
    * the bucket files and cost every probe until compaction folds them
    * out. Compaction resets both to the folded base (the forest is
    * still the original fit — repeated warnings after compaction mean
    * refit, not compact harder). */
  private var fitRows: Long = -1L
  private var atRestRows: Long = -1L
  private def ensureCounts(): Unit = if (fitRows < 0) {
    fitRows = Lsh.load(spark, path).vectors.count()
    atRestRows = fitRows + readOr("vectors_delta", emptySeqIds).count()
  }

  /** Upsert/delete batches applied since the store's last compaction
    * (recovered from the persisted logs on reconstruction). */
  def batchesSeen: Int = batches

  /** Current at-rest growth factor vs the fit-time base (resets to 1.0
    * at compaction/refit; -1.0 until the watermark path takes its first
    * count). The number the occupancy warning fires on. */
  def atRestGrowth: Double =
    if (fitRows <= 0) -1.0 else atRestRows.toDouble / fitRows

  /** True when the NEXT [[onBatch]] call triggers compaction. */
  def compactionDue: Boolean = (batches + 1) % compactEvery == 0

  private def fs =
    org.apache.hadoop.fs.FileSystem.get(
      new Path(path).toUri, spark.sparkContext.hadoopConfiguration)

  private def readOr(sub: String, empty: => DataFrame): DataFrame = {
    val p = s"$path/$sub"
    if (fs.exists(new Path(p))) spark.read.parquet(p) else empty
  }

  private def emptySeqIds: DataFrame =
    spark.range(0).select(col("id").as("vec_id"), lit(0).as("seq"))

  private def tombstones: DataFrame =
    readOr("tombstones", emptySeqIds).select("vec_id", "seq")

  /** The serving view: persisted base + delta logs, minus tombstoned
    * rows (t.seq > row.seq). Anti-joins broadcast the (small) log.
    * Uses the once-loaded frozen [[model]] — `Lsh.load` here would
    * collect the forest's node table to the driver on EVERY serving
    * call (a per-micro-batch tax a foreachBatch loop pays for nothing:
    * the model is frozen by the class contract, and compaction rewrites
    * it byte-identically). */
  def index: LshIndex = {
    val baseVectors = spark.read.parquet(s"$path/vectors")
    val baseBuckets = spark.read.parquet(s"$path/buckets")
      .select(col("tree_id").cast("int").as("tree_id"), col("hash"),
        col("vec_id"))
    val vecs = baseVectors.withColumn("seq", lit(0))
      .unionByName(readOr("vectors_delta", baseVectors.limit(0)
        .withColumn("seq", lit(0)))
        .select("vec_id", "embedding", "seq"))
    val bks = baseBuckets.withColumn("seq", lit(0))
      .unionByName(readOr("buckets_delta", baseBuckets.limit(0)
        .withColumn("seq", lit(0)))
        .select("tree_id", "hash", "vec_id", "seq"))
    val t = broadcast(tombstones)
    def live(df: DataFrame) = df.join(t,
        df("vec_id") === t("vec_id") && t("seq") > df("seq"), "left_anti")
      .drop("seq")
    new LshIndex(model, live(vecs), live(bks))
  }

  /** One streaming maintenance step. `arrivals` rows are
    * (vec_id, embedding); `deletes` rows are (vec_id). An id in both is
    * an upsert (see class doc). */
  def onBatch(arrivals: Option[DataFrame],
              deletes: Option[DataFrame]): Unit = {
    val seq = batches + 1
    // snapshot the at-rest counts BEFORE this batch's delta lands on
    // disk (ensureCounts reads the delta log — initializing it after
    // the write would double-count this batch's arrivals)
    if (occupancyWatermark > 0) ensureCounts()
    arrivals.foreach { a0 =>
      val a = a0.select("vec_id", "embedding")
      a.withColumn("seq", lit(seq))
        .write.mode("append").parquet(s"$path/vectors_delta")
      model.transform(a, "vec_id", "embedding")
        .select(col("tree_id"), col("hash"), col("vec_id"),
          lit(seq).as("seq"))
        .write.mode("append").parquet(s"$path/buckets_delta")
    }
    deletes.foreach { d =>
      d.select(col("vec_id"), lit(seq).as("seq"))
        .write.mode("append").parquet(s"$path/tombstones")
    }
    if (atRestRows >= 0) arrivals.foreach(a => atRestRows += a.count())
    batches = seq
    if (batches % compactEvery == 0) compactNow()
    else if (occupancyWatermark > 0) {
      if (atRestRows > occupancyWatermark * fitRows) log.warn(
        s"stored LSH index '$path' holds $atRestRows rows at rest " +
          f"(${atRestRows.toDouble / math.max(1L, fitRows)}%.1fx the " +
          s"$fitRows-row base its frozen forest was fit for) after " +
          s"$batches batches: expected bucket occupancy — and per-probe " +
          "search cost — has inflated by the same factor. Refit the " +
          "forest, or serve through cappedBuckets/maxCandidates " +
          "(compaction drops tombstoned rows but never re-splits buckets).")
    }
  }

  /** Fold the logs into the base: rewrite the store from the live view,
    * drop the delta and tombstone logs. Idempotent. */
  def compactNow(): Unit = {
    val live = index
    val v = live.vectors.localCheckpoint()
    val b = live.buckets.localCheckpoint()
    new LshIndex(live.model, v, b).save(spark, path)
    Seq("vectors_delta", "buckets_delta", "tombstones")
      .foreach(sub => fs.delete(new Path(s"$path/$sub"), true))
    val folded = v.count()
    // the folded base is the new at-rest snapshot; the forest is still
    // the ORIGINAL fit, so the watermark reference moves with the base
    // (repeated post-compaction warnings mean refit)
    fitRows = folded
    atRestRows = folded
    if (log.isInfoEnabled) log.info(
      s"stored LSH index '$path' compacted after $batches batches " +
        s"($folded live vectors)")
  }

  /** The occupancy warning's prescribed action, as code: RETRAIN the
    * forest on the live view (arrivals included, tombstoned rows
    * dropped), rewrite the whole store, drop the logs. The only
    * maintenance step that re-splits buckets — compaction folds rows
    * but keeps the frozen planes, so per-probe cost stays inflated
    * until this runs. Same seeding/occupancy rules as the original
    * [[Lsh.train]]; the maintainer swaps in the fresh model and keeps
    * serving. */
  def refitNow(config: LshConfig): Unit = {
    val v = index.vectors.localCheckpoint()
    val fresh = Lsh.train(v, "vec_id", "embedding", config)
    fresh.save(spark, path)
    Seq("vectors_delta", "buckets_delta", "tombstones")
      .foreach(sub => fs.delete(new Path(s"$path/$sub"), true))
    modelCache = fresh.model
    val n = v.count()
    fitRows = n
    atRestRows = n
    if (log.isInfoEnabled) log.info(
      s"stored LSH index '$path' refit on $n live vectors after " +
        s"$batches batches (occupancy restored to the config envelope)")
  }
}
