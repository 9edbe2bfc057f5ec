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
    partitionCols: Seq[String] = Nil) {

  require(compactEvery > 0, s"compactEvery $compactEvery must be positive")

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

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
    batches = seq
    if (batches % compactEvery == 0) compactNow()
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
    if (log.isInfoEnabled) log.info(
      s"stored codes table '$path' compacted after $batches batches " +
        s"(${live.count()} live rows)")
  }
}
