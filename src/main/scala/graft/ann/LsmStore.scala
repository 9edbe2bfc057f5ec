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
  *     [[visibleFilter]] drops them from every view — so a crash between
  *     the fence write and the log deletion re-serves correctly (the
  *     surviving rows are fenced off; the next compaction deletes
  *     them);
  *   - **crash-safe compaction commit** ([[commitCompaction]] /
  *     [[recoverCompaction]]): the folded base is written to TEMP
  *     subdirs first, then a pre-commit marker (`_lsm_precommit`,
  *     atomically renamed into place) records the target seq and the
  *     pending renames, and only then do the destructive steps run
  *     (swap temps into place, stamp the fence, drop the logs, drop
  *     the marker). Construction calls [[recoverCompaction]] (via
  *     [[recoverSeq]]): no marker means no compaction was mid-commit
  *     (orphan temp dirs from a pre-marker crash are inert and
  *     overwritten by the next compaction); a marker means every
  *     remaining step is deterministic, so the reopen FINISHES the
  *     commit instead of serving duplicates — the round-11 "residual
  *     crash window" is now self-healing, not a documented manual
  *     dedup. Every step is idempotent (rename skipped when the temp
  *     is gone, fence monotone, log/marker deletes no-ops), so a crash
  *     during recovery itself re-heals on the next open;
  *   - **occupancy-watermark accounting**: `fitRows` is the base
  *     snapshot the frozen model was fit against (counted once,
  *     lazily), `atRestRows` adds delta rows INCLUDING tombstoned ones
  *     (dead rows cost every probe until compacted out). Compaction
  *     updates `atRestRows` but KEEPS `fitRows` — the model is still
  *     the original fit, so growth-since-fit keeps accumulating and
  *     repeated post-compaction warnings correctly say "refit"; only a
  *     refit (which retrains) resets the reference.
  */
private[graft] trait LsmStore {

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
    * no compaction has completed). Read FULLY ([[readMarker]] — a
    * short single read could truncate the seq and regress both the
    * visibility fence and the recovered batch counter). A
    * corrupt/unreadable marker reads as 0 — conservative: stale rows
    * re-serve as duplicates rather than fresh rows being dropped. */
  protected final def readFence(): Int =
    try readMarker("_lsm_fence").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).getOrElse(0)
    catch { case _: Exception => 0 }

  protected final def writeFence(seq: Int): Unit = {
    val out = lsmFs.create(fencePath, true)
    try out.write(seq.toString.getBytes("UTF-8")) finally out.close()
  }

  // ---- atomic multi-log batches ----

  /** Append the batch-commit record for `seq` — the LAST write of a
    * maintainer's onBatch, after every per-log append of the batch.
    * Log rows of a seq with no commit record are IGNORED by
    * [[visibleFilter]], so a crash between a batch's log writes
    * leaves a PARTIAL batch invisible instead of diverging the store
    * (e.g. one postings table written and not the other, or a delete
    * logged without its same-batch upsert arrival). Recovery needs no
    * step: [[recoverSeq]] reads the max seq over ALL log rows
    * (committed or not) and maintainers burn their in-memory seq
    * BEFORE writing, so a retried batch — same instance or after a
    * restart — lands at a FRESH seq and the orphan rows stay invisible
    * until compaction drops the logs. */
  protected final def markBatchCommitted(seq: Int): Unit = {
    guardPoisoned()
    lsmSpark.range(1).select(lit(seq).as("seq"))
      .write.mode("append").parquet(s"$lsmPath/batch_commits")
  }

  /** (Re-)create the commit log, empty — its EXISTENCE is load-bearing:
    * a missing dir reads as legacy pass-through, so every path that
    * drops the logs must re-create it before new batches land, and
    * construction creates/backfills it ([[recoverSeq]]). */
  protected final def initCommitLog(): Unit =
    // the seq-0 sentinel keeps the dir NON-empty at rest (seq 0 rows
    // always pass the filter anyway): sync/copy tools that drop empty
    // dirs cannot erase the commit log and downgrade a new-format
    // store to the legacy pass-through
    lsmSpark.range(1).select(lit(0).as("seq"))
      .write.mode("append").parquet(s"$lsmPath/batch_commits")

  // ---- poisoned-instance guard ----

  /** Set when the destructive half of a commit threw mid-swap: the
    * store may be HALF-SWAPPED on disk (e.g. new sparse + old bm25,
    * fence unstamped, logs visible). A caller that catches the commit
    * exception and keeps serving would read diverged or duplicated
    * views — healing only happens at the next CONSTRUCTION
    * ([[recoverCompaction]] retries the commit from the marker), so
    * every serving/maintenance entry point throws until then. */
  @volatile private var commitPoisoned: Boolean = false

  /** Throws when a failed commit has poisoned this instance (see
    * [[commitPoisoned]]) — called by every serving/batch entry point. */
  protected final def guardPoisoned(): Unit =
    if (commitPoisoned) throw new IllegalStateException(
      s"LSM store '$lsmPath': a compaction/swap commit failed mid-swap " +
        "on this instance — the on-disk store may be half-swapped. " +
        "Construct a new instance (recovery finishes the commit from " +
        "the pre-commit marker at construction); do not keep serving " +
        "from this one.")

  /** Run the destructive half of a commit, poisoning this instance if
    * it throws (the marker and temps stay on disk for recovery). */
  protected final def poisonOnFailure[T](f: => T): T =
    try { val r = f; commitPoisoned = false; r }
    catch { case e: Throwable => commitPoisoned = true; throw e }

  /** The single visibility rule every log read applies (fence + commit
    * record fused — one fence read and one commit-log read per CALL;
    * a view composed of several log reads pays one pair per leg):
    * base rows (seq 0) always pass; rows at or below the fence were
    * folded by a committed compaction and drop; rows above the fence
    * pass only with a batch-commit record. The commit log exists from
    * construction on (recoverSeq backfills legacy stores — whose rows
    * were committed by the old single-write contract — and creates it
    * empty for fresh ones; every log-dropping commit re-creates it),
    * so the missing-dir pass-through can only be observed in the
    * instant between a commit's log-drop and its re-create, when the
    * logs are empty anyway. */
  protected final def visibleFilter(df: DataFrame): DataFrame = {
    guardPoisoned()
    val fence = readFence()
    val unfenced =
      if (fence == 0) df
      else df.where(col("seq") === 0 || col("seq") > fence)
    if (!lsmFs.exists(new Path(s"$lsmPath/batch_commits"))) return unfenced
    val commits = lsmSpark.read.parquet(s"$lsmPath/batch_commits")
      .select(col("seq").as("c_seq")).distinct()
      .withColumn("c_ok", lit(true))
    unfenced
      .join(broadcast(commits), unfenced("seq") === col("c_seq"), "left")
      .where(col("seq") === 0 || col("c_ok"))
      .drop("c_seq", "c_ok")
  }

  // ---- consecutive-drift-breach run (the refitDue signal) ----

  /** Length of the consecutive-drifted-batch run ending at the most
    * recent MEASURED batch (a batch with arrivals under a configured
    * [[DriftCheck]]) — persistent via the `_drift_breaches` marker, so
    * a reconstructed maintainer agrees with the live one (the
    * `compactionDue` treatment: the refit signal must survive a
    * restart, or a crash loop would reset the clock forever). 0 when
    * never measured, the last measured batch was clean, or a refit
    * restarted the run. */
  final def driftBreaches: Int =
    try readMarker("_drift_breaches").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).getOrElse(0)
    catch { case _: Exception => 0 }

  /** Record one measured batch: a breach extends the run, a clean
    * batch resets it. Returns the updated run length. One tiny marker
    * write per CHANGE of run length (a clean batch on a zero run is
    * free). */
  protected final def recordDriftBreach(breached: Boolean): Int = {
    val prev = driftBreaches
    val run = if (breached) prev + 1 else 0
    if (run != prev) publishMarker("_drift_breaches", run.toString)
    run
  }

  /** Stage a zeroed breach marker inside the compaction temp dir and
    * return its rename pair — a REFIT commit includes it in its
    * [[commitCompaction]] renames so the run reset is ATOMIC with the
    * model swap: a crash after the commit's destructive half can never
    * leave `refitDue` latched true over an already-refit store (the
    * reconstructed maintainer would re-run the O(corpus) refit for
    * nothing), and recovery re-applies the reset with the rest of the
    * marker's renames. */
  protected final def stageDriftBreachReset(): (String, String) = {
    lsmFs.mkdirs(new Path(s"$lsmPath/$CompactTmpDir"))
    val tmp = new Path(s"$lsmPath/$CompactTmpDir/_drift_breaches")
    val out = lsmFs.create(tmp, true)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    s"$CompactTmpDir/_drift_breaches" -> "_drift_breaches"
  }

  // ---- small atomic markers (shared by the compaction commit and
  //      GraphMaintainer's table-swap commit) ----

  /** Atomically publish a small marker file (temp + rename; ABORTS —
    * nothing destructive has run yet — when the FS reports failure,
    * which Hadoop FileSystems signal as `false`, not exceptions). */
  protected final def publishMarker(markerFile: String, body: String): Unit = {
    val tmp = new Path(s"$lsmPath/$markerFile.tmp")
    val out = lsmFs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fin = new Path(s"$lsmPath/$markerFile")
    lsmFs.delete(fin, false)
    require(lsmFs.rename(tmp, fin),
      s"LSM store '$lsmPath': failed to publish marker '$markerFile' — " +
        "aborting before any destructive step")
  }

  /** Read a marker FULLY (None when absent). InputStream.read may
    * legally return fewer bytes than available — a single-read parse
    * could truncate a seq and corrupt recovery. */
  protected final def readMarker(markerFile: String): Option[String] = {
    val mp = new Path(s"$lsmPath/$markerFile")
    if (!lsmFs.exists(mp)) return None
    val in = lsmFs.open(mp)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      Some(new String(bos.toByteArray, "UTF-8"))
    } finally in.close()
  }

  // ---- crash-safe compaction commit ----

  /** Subdir all compaction temp writes land under (relative to
    * [[lsmPath]]) before being swapped into place. */
  protected final val CompactTmpDir = "_compact_tmp"

  private def precommitPath = new Path(s"$lsmPath/_lsm_precommit")

  /** Commit a compaction whose folded base has already been fully
    * written under `$lsmPath/$CompactTmpDir`: atomically publish the
    * pre-commit marker (seq + pending renames), then swap each
    * (tmpSub, finalSub) into place, stamp the fence at `seq`, drop the
    * logs, drop the marker. The marker is written via temp-file +
    * rename so it is never observed partially; once it exists, the
    * commit is deterministic and [[recoverCompaction]] can finish it
    * after a crash at ANY later point. */
  protected final def commitCompaction(seq: Int,
                                       renames: Seq[(String, String)]): Unit = {
    publishMarker("_lsm_precommit",
      (seq.toString +: renames.map { case (t, f) => s"$t>$f" })
        .mkString("\n"))
    poisonOnFailure(finishCommit(seq, renames))
  }

  /** The destructive half of the commit — idempotent: a rename whose
    * temp dir is gone already happened, the fence write is monotone,
    * and the log/marker deletes are no-ops when already done. Runs
    * both live (from [[commitCompaction]]) and on recovery. Every
    * swap's boolean result is CHECKED: a failed delete-or-rename
    * throws with the marker and temp dirs still in place, so the
    * fence/log-drop never run on a half-swapped store and the next
    * open retries the commit. */
  private def finishCommit(seq: Int, renames: Seq[(String, String)]): Unit = {
    renames.foreach { case (tmp, fin) =>
      val tp = new Path(s"$lsmPath/$tmp")
      val fp = new Path(s"$lsmPath/$fin")
      if (lsmFs.exists(tp)) {
        require(!lsmFs.exists(fp) || lsmFs.delete(fp, true),
          s"LSM store '$lsmPath': failed to clear '$fin' for the " +
            "compaction swap — marker and temp base kept; reopen retries")
        require(lsmFs.rename(tp, fp),
          s"LSM store '$lsmPath': failed to swap '$tmp' into '$fin' — " +
            "marker and temp base kept; reopen retries")
      }
    }
    if (readFence() < seq) writeFence(seq)
    lsmLogDirs.foreach(sub => lsmFs.delete(new Path(s"$lsmPath/$sub"), true))
    lsmFs.delete(new Path(s"$lsmPath/$CompactTmpDir"), true)
    // re-create the (empty) commit log IMMEDIATELY: its absence reads
    // as legacy pass-through, and a first-post-compaction-batch crash
    // must be filtered, not passed through
    initCommitLog()
    lsmFs.delete(precommitPath, false)
  }

  /** Detect and finish a compaction that crashed mid-commit. Called by
    * [[recoverSeq]] so every maintainer heals at construction; safe to
    * call any time. No marker → nothing mid-commit (a crash BEFORE the
    * marker leaves only inert temp dirs, which the next compaction
    * overwrites — the base and logs are untouched at that point). */
  protected final def recoverCompaction(): Unit = {
    val body = readMarker("_lsm_precommit").getOrElse(return)
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // Defensive parse: the marker is published via temp-file + rename,
    // so a 0-byte or garbled body can only come from an FS that creates
    // the rename target before the content syncs — a crash point BEFORE
    // publishMarker returned, hence BEFORE any destructive step ran
    // (base and logs are fully intact; only inert temps exist). The
    // safe recovery is to ABORT the never-started commit — drop the
    // marker and the temp dir — not to brick every construction with a
    // NumberFormatException (the recoverSwap tolerance, applied here).
    val parsed: Option[(Int, Seq[(String, String)])] = try {
      val lines = body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      val seq = lines.head.toInt
      val renames = lines.tail.map { l =>
        val i = l.indexOf('>')
        require(i > 0 && i < l.length - 1, s"rename line '$l' has no '>'")
        (l.substring(0, i), l.substring(i + 1))
      }
      Some((seq, renames))
    } catch { case _: Exception => None }
    parsed match {
      case None =>
        log.warn(
          s"LSM store '$lsmPath': the compaction pre-commit marker at " +
            s"$precommitPath is empty or unparseable (body: " +
            s"'${body.take(80)}') — the publishing process crashed " +
            "before the marker content synced, so no destructive step " +
            "ran. Discarding the marker and the temp dir; the aborted " +
            "compaction simply retries at its next cadence.")
        lsmFs.delete(precommitPath, false)
        lsmFs.delete(new Path(s"$lsmPath/$CompactTmpDir"), true)
      case Some((seq, renames)) =>
        log.warn(
          s"LSM store '$lsmPath': found a compaction pre-commit marker " +
            s"(seq $seq) — a previous process crashed mid-commit; finishing " +
            "the commit (swap folded base into place, stamp fence, drop logs).")
        poisonOnFailure(finishCommit(seq, renames))
    }
  }

  // ---- persistent sequence ----

  /** Recover the batch sequence at construction: heal any mid-commit
    * compaction first ([[recoverCompaction]]), then max(fence, max log
    * seq). Fresh store → 0; freshly-compacted store → the fence, so a
    * reconstructed maintainer agrees with the live one that compacted. */
  protected final def recoverSeq(): Int = {
    recoverCompaction()
    if (!lsmFs.exists(new Path(s"$lsmPath/batch_commits"))) {
      // legacy or fresh store: rows written before the commit-record
      // format were committed by the old single-write contract —
      // BACKFILL records for their seqs (atomically, via dir rename)
      // so activating the filter cannot drop them; a fresh store gets
      // the empty dir, so even its FIRST batch's crash is filtered
      val backfill = new Path(s"$lsmPath/_batch_commits_backfill")
      val legacySeqs = lsmLogDirs.filterNot(_ == "batch_commits")
        .map(sub => readOr(sub, emptySeqIds).select("seq"))
        .reduce(_.unionByName(_))
        .where(col("seq") > 0).distinct()
        .persist()
      val nLegacy = legacySeqs.count()
      if (nLegacy > 0)
        // loud: on a true pre-format store this is the intended
        // upgrade; but if a new-format store LOST its commit log
        // (partial copy/sync), this backfill blesses any orphan rows —
        // the operator should know which of the two happened
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"LSM store '$lsmPath': no commit log found — backfilling " +
            s"commit records for $nLegacy existing log seq(s) as " +
            "legacy-committed (pre-commit-record format). If this " +
            "store was written under the commit-record format and its " +
            "commit log was lost in a copy, uncommitted partial " +
            "batches (if any) are being blessed here.")
      legacySeqs.unionByName(
          lsmSpark.range(1).select(lit(0).as("seq")))
        .write.mode("overwrite").parquet(backfill.toString)
      legacySeqs.unpersist(false)
      require(lsmFs.rename(backfill, new Path(s"$lsmPath/batch_commits")),
        s"LSM store '$lsmPath': failed to install the backfilled " +
          "commit log")
    }
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

object LsmStore {
  /** Default compaction cadence, read off the measured serve-latency-
    * vs-log-depth curve (LifecycleScaleProbe at 1M×64-d, SCALE.md):
    * view searches are FLAT through ~25 batches of logs (3.0 → 3.4 s),
    * then small-fragment overhead compounds (5.0 s at 50, 7.4 s at
    * 100, vs a 2.0 s compacted baseline). 32 sits at the knee: serve
    * overhead stays inside ~20% while the fold amortizes to well under
    * the per-batch logging cost itself (14.8 s / 32 ≈ 0.5 s per
    * batch). Deployments with bigger batches (fewer, larger fragments)
    * can raise it; the watermark warnings fire either way. */
  val DefaultCompactEvery = 32
}
