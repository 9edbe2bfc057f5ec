package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared LSM plumbing for maintained index stores —
  * [[graft.ann.lsh.LshMaintainer]] (bucket layout) and
  * [[CodesMaintainer]] (compressed code tables). One implementation of
  * the semantics both maintainers' suites pin, so they cannot drift:
  *
  *   - **seq-stamped logs**: delta appends and tombstones carry the
  *     batch sequence; a tombstone kills rows of its id from STRICTLY
  *     EARLIER batches (base rows are seq 0), making same-batch
  *     delete+arrival an upsert;
  *   - **persistent sequence**: recovered at construction as
  *     max(compaction fence, max seq across the logs) — a restarted
  *     counter would let an old tombstone kill a new arrival (old
  *     delete beats new insert: the LSM ordering inverted);
  *   - **compaction fence** (`_lsm_fence`, a tiny marker file): written
  *     AFTER the folded base lands and BEFORE the logs are deleted.
  *     Log rows with seq ≤ fence are already IN the base, and
  *     [[staleFilter]] drops them from every view — so a crash between
  *     the fence write and the log deletion re-serves correctly (the
  *     surviving rows are fenced off; the next compaction deletes
  *     them). The remaining window — a crash between the base rewrite
  *     and the fence write — leaves unfenced logs that would duplicate
  *     folded rows: if a store may have died there, dedup the base once
  *     (a vec_id-distinct rewrite) before resuming. Neither window
  *     loses data;
  *   - **occupancy-watermark accounting**: `fitRows` is the base
  *     snapshot the frozen model was fit against (counted once,
  *     lazily), `atRestRows` adds delta rows INCLUDING tombstoned ones
  *     (dead rows cost every probe until compacted out). Compaction
  *     updates `atRestRows` but KEEPS `fitRows` — the model is still
  *     the original fit, so growth-since-fit keeps accumulating and
  *     repeated post-compaction warnings correctly say "refit"; only a
  *     refit (which retrains) resets the reference.
  */
private[ann] trait LsmStore {

  protected def lsmSpark: SparkSession
  protected def lsmPath: String
  /** Log subdirs holding seq-stamped rows (delta logs + tombstones). */
  protected def lsmLogDirs: Seq[String]

  protected final def lsmFs: org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      new Path(lsmPath).toUri, lsmSpark.sparkContext.hadoopConfiguration)

  protected final def readOr(sub: String, empty: => DataFrame): DataFrame = {
    val p = s"$lsmPath/$sub"
    if (lsmFs.exists(new Path(p))) lsmSpark.read.parquet(p) else empty
  }

  protected final def emptySeqIds: DataFrame =
    lsmSpark.range(0).select(col("id").as("vec_id"), lit(0).as("seq"))

  // ---- compaction fence ----

  private def fencePath = new Path(s"$lsmPath/_lsm_fence")

  /** Seq through which the logs have been folded into the base (0 when
    * no compaction has completed). A corrupt/unreadable marker reads as
    * 0 — conservative: stale rows re-serve as duplicates rather than
    * fresh rows being dropped. */
  protected final def readFence(): Int =
    try {
      if (!lsmFs.exists(fencePath)) 0
      else {
        val in = lsmFs.open(fencePath)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          if (n <= 0) 0 else new String(buf, 0, n, "UTF-8").trim.toInt
        } finally in.close()
      }
    } catch { case _: Exception => 0 }

  protected final def writeFence(seq: Int): Unit = {
    val out = lsmFs.create(fencePath, true)
    try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Drop log rows already folded into the base (seq ≤ fence); base
    * rows (seq 0) always pass. Apply to every log read in a view. */
  protected final def staleFilter(df: DataFrame): DataFrame = {
    val fence = readFence()
    if (fence == 0) df
    else df.where(col("seq") === 0 || col("seq") > fence)
  }

  // ---- persistent sequence ----

  /** Recover the batch sequence at construction: max(fence, max log
    * seq). Fresh store → 0; freshly-compacted store → the fence, so a
    * reconstructed maintainer agrees with the live one that compacted. */
  protected final def recoverSeq(): Int = {
    val logs = lsmLogDirs
      .map(sub => readOr(sub, emptySeqIds).select("seq"))
      .reduce(_.unionByName(_))
    val m = logs.agg(max("seq")).head()
    math.max(readFence(), if (m.isNullAt(0)) 0 else m.getInt(0))
  }

  // ---- occupancy-watermark accounting ----

  protected var fitRows: Long = -1L
  protected var atRestRows: Long = -1L

  /** Take the base/delta snapshot once, BEFORE a batch's delta lands
    * (counting after the write would double-count the batch). The fit
    * reference is the base snapshot first observed — after crashes or
    * external compactions it may include absorbed arrivals; a refit
    * pins it to a true fit. */
  protected final def ensureCounts(baseCount: => Long,
                                   deltaCount: => Long): Unit =
    if (fitRows < 0) {
      fitRows = baseCount
      atRestRows = fitRows + deltaCount
    }

  /** Current at-rest growth factor vs the fit-time base (-1.0 until the
    * watermark path takes its first count). The number the occupancy
    * warning fires on. */
  final def atRestGrowth: Double =
    if (fitRows <= 0) -1.0 else atRestRows.toDouble / fitRows

  /** True when the warning should fire: counts taken, a non-empty fit
    * base (an empty-base bootstrap has no meaningful growth factor),
    * and at-rest rows past the watermark. */
  protected final def pastWatermark(watermark: Double): Boolean =
    watermark > 0 && fitRows > 0 && atRestRows > watermark * fitRows

  /** Compaction folded `folded` live rows: the at-rest count resets to
    * the base, the FIT reference does not (the model is unchanged). */
  protected final def onCompacted(folded: Long): Unit =
    if (fitRows >= 0) atRestRows = folded

  /** A refit retrained the model on `n` live rows: both reset. */
  protected final def onRefit(n: Long): Unit = {
    fitRows = n
    atRestRows = n
  }
}
