package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduled maintenance for a STORED compressed-codes index (SQ, BQ,
  * PQ, IVF-SQ, IVF-PQ) under streaming upserts/deletes — the
  * codes-table generalization of [[graft.ann.lsh.LshMaintainer]]'s
  * miniature LSM store. Every compressed family persists one codes
  * table at `$path/codes` plus small frozen-model dirs; the family
  * differences are captured by two constructor closures:
  *
  *   - `encode`: the FROZEN-model transform taking (vec_id, embedding)
  *     arrivals to code rows — each family's `model.transform` /
  *     `encodeCol` projection, map-side by construction (the same
  *     frozen-model append contract as `SqIndex.append` etc.);
  *   - `partitionCols`: the at-rest layout (e.g. `Seq("cell")` for
  *     IVF-SQ/IVF-PQ, whose probe pruning is partition pruning) —
  *     applied to the delta log too, so probes prune delta files the
  *     same way they prune the base.
  *
  * LSM legs (semantics identical to LshMaintainer, spec-pinned there):
  * appends land seq-stamped in `codes_delta`; deletes append to the
  * `tombstones` log; a tombstone kills rows of that id from STRICTLY
  * EARLIER batches (base rows are seq 0), so same-batch delete+arrival
  * is an upsert; [[liveCodes]] assembles the serving view (base ∪
  * delta, anti-join the broadcast log) — feed it to the family's index
  * constructor (`new SqIndex(model, m.liveCodes)`); every
  * `compactEvery` batches [[compactNow]] folds everything into
  * `$path/codes` and drops the logs. The sequence counter is PERSISTENT
  * state recovered from the on-disk logs at construction (the
  * LshMaintainer restart rule: a restarted counter would let an old
  * tombstone kill a new arrival).
  *
  * Driver-side state is one Int; everything heavy is DataFrame jobs —
  * safe as a `foreachBatch` body.
  */
final class CodesMaintainer(
    spark: SparkSession,
    path: String,
    encode: DataFrame => DataFrame,
    compactEvery: Int,
    partitionCols: Seq[String] = Nil,
    occupancyWatermark: Double = 0.0) {

  require(compactEvery > 0, s"compactEvery $compactEvery must be positive")

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Watermark state, tracked incrementally (the LshMaintainer rule):
    * `fitRows` is the base snapshot the frozen model was fit against,
    * `atRestRows` adds the delta-log rows INCLUDING tombstoned ones
    * (dead code rows still sit in the scanned files until compaction).
    * For the frozen models the inflation is per-family drift — SQ
    * bounds saturate, PQ codebooks go stale, IVF cells crowd — so the
    * warning's action is refit/retrain, not compact harder; compaction
    * resets the reference to the folded base. */
  private var fitRows: Long = -1L
  private var atRestRows: Long = -1L
  private def ensureCounts(): Unit = if (fitRows < 0) {
    fitRows = base.count()
    atRestRows = fitRows +
      readOr("codes_delta", emptySeqIds).count()
  }

  private def fs =
    org.apache.hadoop.fs.FileSystem.get(
      new Path(path).toUri, spark.sparkContext.hadoopConfiguration)

  private def readOr(sub: String, empty: => DataFrame): DataFrame = {
    val p = s"$path/$sub"
    if (fs.exists(new Path(p))) spark.read.parquet(p) else empty
  }

  private def emptySeqIds: DataFrame =
    spark.range(0).select(col("id").as("vec_id"), lit(0).as("seq"))

  private def base: DataFrame = spark.read.parquet(s"$path/codes")

  private var batches = {
    val logs = Seq("codes_delta", "tombstones")
      .map(sub => readOr(sub, emptySeqIds).select("seq"))
      .reduce(_.unionByName(_))
    val m = logs.agg(max("seq")).head()
    if (m.isNullAt(0)) 0 else m.getInt(0)
  }

  /** Upsert/delete batches applied since the store's last compaction
    * (recovered from the persisted logs on reconstruction). */
  def batchesSeen: Int = batches

  /** True when the NEXT [[onBatch]] call triggers compaction. */
  def compactionDue: Boolean = (batches + 1) % compactEvery == 0

  /** Current at-rest growth factor vs the fit-time base (resets to 1.0
    * at compaction; -1.0 until the watermark path takes its first
    * count). The number the occupancy warning fires on. */
  def atRestGrowth: Double =
    if (fitRows <= 0) -1.0 else atRestRows.toDouble / fitRows

  private def tombstones: DataFrame =
    readOr("tombstones", emptySeqIds).select("vec_id", "seq")

  /** The serving view: persisted base + delta log, minus tombstoned
    * rows (t.seq > row.seq; base rows are seq 0). Pass to the family's
    * index constructor. */
  def liveCodes: DataFrame = {
    val all = base.withColumn("seq", lit(0))
      .unionByName(readOr("codes_delta",
        base.limit(0).withColumn("seq", lit(0))))
    val t = broadcast(tombstones)
    all.join(t, all("vec_id") === t("vec_id") && t("seq") > all("seq"),
        "left_anti")
      .drop("seq")
  }

  /** One maintenance step. `arrivals` rows are (vec_id, embedding);
    * `deletes` rows are (vec_id). An id in both is an upsert. */
  def onBatch(arrivals: Option[DataFrame],
              deletes: Option[DataFrame]): Unit = {
    val seq = batches + 1
    // counts snapshot BEFORE this batch's delta lands (the log read in
    // ensureCounts would otherwise double-count this batch)
    if (occupancyWatermark > 0) ensureCounts()
    arrivals.foreach { a =>
      val w = encode(a).withColumn("seq", lit(seq))
        .write.mode("append")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(s"$path/codes_delta")
    }
    deletes.foreach { d =>
      d.select(col("vec_id"), lit(seq).as("seq"))
        .write.mode("append").parquet(s"$path/tombstones")
    }
    if (atRestRows >= 0) arrivals.foreach(a => atRestRows += a.count())
    batches = seq
    if (batches % compactEvery == 0) compactNow()
    else if (occupancyWatermark > 0 &&
        atRestRows > occupancyWatermark * fitRows) log.warn(
      s"stored codes table '$path' holds $atRestRows rows at rest " +
        f"(${atRestRows.toDouble / math.max(1L, fitRows)}%.1fx the " +
        s"$fitRows-row base its frozen model was fit for) after " +
        s"$batches batches: the model's drift envelope (SQ bound " +
        "saturation / PQ codebook staleness / IVF cell crowding — see " +
        "each family's append scaladoc) has likely been outgrown. " +
        "Refit/retrain; compaction drops tombstoned rows but never " +
        "re-fits the model.")
  }

  /** Fold the logs into the base codes table (family layout preserved
    * via `partitionCols`), drop the logs. Idempotent. */
  def compactNow(): Unit = {
    val live = liveCodes.localCheckpoint()
    val w = live.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$path/codes")
    Seq("codes_delta", "tombstones")
      .foreach(sub => fs.delete(new Path(s"$path/$sub"), true))
    val folded = live.count()
    fitRows = folded
    atRestRows = folded
    if (log.isInfoEnabled) log.info(
      s"stored codes table '$path' compacted after $batches batches " +
        s"($folded live rows)")
  }
}
