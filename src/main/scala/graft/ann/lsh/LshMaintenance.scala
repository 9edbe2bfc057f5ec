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
  *     non-fatal — the [[Lsh.fit]] pattern) when the index has grown
  *     past `occupancyWatermark`× its fit sample: frozen planes still
  *     hash arrivals correctly, but expected bucket occupancy — and so
  *     per-probe search cost — inflates by the growth factor
  *     ([[LshConfig.expectedOccupancy]]); refit, or serve through
  *     [[LshIndex.cappedBuckets]] / `maxCandidates`.
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

  private var batches = 0

  /** Upsert/delete batches applied since construction. */
  def batchesSeen: Int = batches

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
    * rows (t.seq > row.seq). Anti-joins broadcast the (small) log. */
  def index: LshIndex = {
    val base = Lsh.load(spark, path)
    val vecs = base.vectors.withColumn("seq", lit(0))
      .unionByName(readOr("vectors_delta", base.vectors.limit(0)
        .withColumn("seq", lit(0)))
        .select("vec_id", "embedding", "seq"))
    val bks = base.buckets.withColumn("seq", lit(0))
      .unionByName(readOr("buckets_delta", base.buckets.limit(0)
        .withColumn("seq", lit(0)))
        .select("tree_id", "hash", "vec_id", "seq"))
    val t = broadcast(tombstones)
    def live(df: DataFrame) = df.join(t,
        df("vec_id") === t("vec_id") && t("seq") > df("seq"), "left_anti")
      .drop("seq")
    new LshIndex(base.model, live(vecs), live(bks))
  }

  /** One streaming maintenance step. `arrivals` rows are
    * (vec_id, embedding); `deletes` rows are (vec_id). An id in both is
    * an upsert (see class doc). */
  def onBatch(arrivals: Option[DataFrame],
              deletes: Option[DataFrame]): Unit = {
    val seq = batches + 1
    val model = LshModel.load(spark, s"$path/model")
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
    batches = seq
    if (batches % compactEvery == 0) compactNow()
    else if (occupancyWatermark > 0) {
      val total = index.vectors.count()
      val cfg = model.config
      if (cfg.expectedOccupancy(total) >
          occupancyWatermark * cfg.kMinVecs) log.warn(
        s"stored LSH index '$path' holds $total live vectors, " +
          f"${total.toDouble / cfg.fitSampleSize(total)}%.1fx its fit " +
          s"sample after $batches batches: expected bucket occupancy — " +
          "and per-probe search cost — has inflated by the same factor " +
          "(LshConfig.expectedOccupancy). Refit the forest, or serve " +
          "through cappedBuckets/maxCandidates.")
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
    log.info(s"stored LSH index '$path' compacted after $batches batches " +
      s"(${v.count()} live vectors)")
  }
}
