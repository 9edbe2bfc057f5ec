package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ivfsq.{IvfSq, IvfSqConfig}
import graft.ann.sq.Sq

/** [[CodesMaintainer]] — the LSM loop over a stored compressed-codes
  * table. Identity under test: after mixed add/delete/upsert batches,
  * `liveCodes` is row-identical to the in-memory lifecycle chain
  * (withDeletes/append/upsert) applying the same ops; compaction folds
  * the logs into the base without changing a row and preserves the
  * family's partition layout; the seq counter recovers from the
  * persisted logs on reconstruction (the LshMaintainer restart rule).
  */
class CodesMaintainerSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkCorpus(n: Int, seed: Int = 11) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  private def rows(codes: DataFrame): Map[Long, String] =
    codes.collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.schema.fieldNames.filterNot(_ == "vec_id").sorted
          .map(f => r.get(r.fieldIndex(f))).mkString("|"))
    }.toMap

  test("SQ codes LSM: batches == in-memory chain; compaction; restart recovery") {
    val corpus = mkCorpus(40)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_sq").toString + "/idx"
    idx.save(spark, path)

    val arrivals1 = mkCorpus(50, seed = 29).where($"vec_id" >= 40L)
    val dead1 = Seq(2L, 9L)
    // upsert: id 5 takes id 0's embedding
    val newEmb = corpus.where($"vec_id" === 0L)
      .select($"embedding").as[Seq[Double]].head()
    val up2 = Seq(5L -> newEmb).toDF("vec_id", "embedding")

    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 3,
      occupancyWatermark = 10.0)

    m.onBatch(Some(arrivals1), Some(dead1.toDF("vec_id")))
    m.onBatch(Some(up2), Some(up2.select("vec_id")))
    // at-rest growth counts delta rows INCLUDING tombstoned ones:
    // 40 base + 10 arrivals + 1 upsert re-add over the 40-row fit
    assert(math.abs(m.atRestGrowth - 51.0 / 40.0) < 1e-9,
      s"at-rest growth ${m.atRestGrowth}")

    val chain = idx.withDeletes(dead1.toDF("vec_id"))
      .append(arrivals1).upsert(up2)
    assert(rows(m.liveCodes) === rows(chain.codes),
      "LSM view != in-memory lifecycle chain")

    // restart: a reconstructed maintainer continues the sequence
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 3)
    assert(m2.batchesSeen === 2, s"seq not recovered: ${m2.batchesSeen}")
    assert(m2.compactionDue)

    // batch 3 (empty) triggers compaction: base == view, logs gone,
    // and the fence keeps the lifetime counter across reconstruction
    m2.onBatch(None, None)
    val reloaded = Sq.load(spark, path)
    assert(rows(reloaded.codes) === rows(chain.codes),
      "compacted base != lifecycle chain")
    assert(!new java.io.File(s"$path/codes_delta").exists() &&
      !new java.io.File(s"$path/tombstones").exists(),
      "logs survived compaction")
    assert(new CodesMaintainer(spark, path, enc, compactEvery = 3)
      .batchesSeen === 3,
      "compaction fence lost the lifetime batch counter")
  }

  test("compaction fence makes logs surviving a post-fence crash harmless") {
    val corpus = mkCorpus(30)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_crash").toString + "/idx"
    idx.save(spark, path)
    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")

    val m = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals), Some(Seq(3L).toDF("vec_id")))
    val expected = rows(idx.withDeletes(Seq(3L).toDF("vec_id"))
      .append(arrivals).codes)
    assert(rows(m.liveCodes) === expected)

    // snapshot the logs, compact, then restore them — simulating a
    // crash AFTER the fence write but BEFORE the log deletion (the
    // LsmStore crash window the fence exists for)
    def cp(from: String, to: String): Unit = {
      val src = java.nio.file.Paths.get(from)
      val dst = java.nio.file.Paths.get(to)
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val stash = java.nio.file.Files
      .createTempDirectory("codes_lsm_stash").toString
    cp(s"$path/codes_delta", s"$stash/codes_delta")
    cp(s"$path/tombstones", s"$stash/tombstones")
    m.compactNow()
    cp(s"$stash/codes_delta", s"$path/codes_delta")
    cp(s"$stash/tombstones", s"$path/tombstones")

    // the restored (stale) log rows are fenced off: no duplicates, no
    // resurrected tombstone kills — live view and a reconstructed
    // maintainer's view both equal the folded truth
    assert(rows(m.liveCodes) === expected,
      "stale logs after the fence polluted the live view")
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(rows(m2.liveCodes) === expected)
    assert(m2.batchesSeen === 1, s"seq: ${m2.batchesSeen}")
    // and the duplicate-count check the fence exists for: a vec_id
    // appears exactly once
    val dups = m2.liveCodes.groupBy("vec_id").count()
      .where($"count" > 1).count()
    assert(dups === 0, s"$dups duplicated ids in the fenced view")
  }

  test("residual crash windows self-heal at construction (no manual dedup)") {
    val corpus = mkCorpus(30)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_heal").toString + "/idx"
    idx.save(spark, path)
    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")
    def writeMarker(seq: Int): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$path/_lsm_precommit"),
        s"$seq\n_compact_tmp/codes>codes".getBytes("UTF-8"))
    def noDups(df: DataFrame): Unit =
      assert(df.groupBy("vec_id").count().where($"count" > 1).count() === 0)

    // ---- window A: folded base written + marker published, CRASH
    // before any rename/fence/log-drop (the round-11 "residual window":
    // unfenced logs would duplicate folded rows) ----
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals), Some(Seq(3L).toDF("vec_id")))
    val expected = rows(idx.withDeletes(Seq(3L).toDF("vec_id"))
      .append(arrivals).codes)
    m.liveCodes.localCheckpoint()
      .write.mode("overwrite").parquet(s"$path/_compact_tmp/codes")
    writeMarker(1)
    // crash here. A reopened maintainer must FINISH the commit:
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(!new java.io.File(s"$path/_lsm_precommit").exists(), "marker kept")
    assert(!new java.io.File(s"$path/codes_delta").exists() &&
      !new java.io.File(s"$path/tombstones").exists(), "logs survived heal")
    assert(rows(m2.liveCodes) === expected, "healed view wrong")
    assert(rows(Sq.load(spark, path).codes) === expected, "healed base wrong")
    noDups(m2.liveCodes)
    assert(m2.batchesSeen === 1, s"seq: ${m2.batchesSeen}")

    // ---- window B: base swapped into place, CRASH before the fence
    // write (logs + marker still present, fence stale) ----
    val arrivals2 = mkCorpus(50, seed = 31).where($"vec_id" >= 40L)
    m2.onBatch(Some(arrivals2), Some(Seq(5L).toDF("vec_id")))
    val expected2 = rows(idx.withDeletes(Seq(3L).toDF("vec_id"))
      .append(arrivals).withDeletes(Seq(5L).toDF("vec_id"))
      .append(arrivals2).codes)
    val folded2 = m2.liveCodes.localCheckpoint()
    folded2.write.mode("overwrite").parquet(s"$path/_compact_tmp/codes")
    writeMarker(2)
    // manual rename (the commit's first destructive step), then crash
    def del(p: String): Unit = {
      val f = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(f))
        java.nio.file.Files.walk(f)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.delete(x))
    }
    del(s"$path/codes")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$path/_compact_tmp/codes"),
      java.nio.file.Paths.get(s"$path/codes"))
    // crash here: fence still 1, logs still present, marker present
    val m3 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(rows(m3.liveCodes) === expected2, "window-B healed view wrong")
    noDups(m3.liveCodes)
    assert(m3.batchesSeen === 2, s"seq: ${m3.batchesSeen}")
    assert(!new java.io.File(s"$path/_lsm_precommit").exists())
    assert(!new java.io.File(s"$path/codes_delta").exists())
  }

  test("a partial batch (no commit record) is invisible; a retry lands at a fresh seq") {
    val corpus = mkCorpus(30)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_atomic").toString + "/idx"
    idx.save(spark, path)
    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")

    // batch 1 commits normally
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    val arrivals1 = mkCorpus(35, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals1), None)
    val afterB1 = rows(m.liveCodes)

    // batch 2 CRASHES mid-write: the delta rows land, the tombstone
    // row lands, but the commit record never does — simulate by
    // writing the logs in onBatch's format directly
    val arrivals2 = mkCorpus(40, seed = 31).where($"vec_id" >= 35L)
    enc(arrivals2).withColumn("seq", lit(2))
      .write.mode("append").parquet(s"$path/codes_delta")
    Seq((3L, 2)).toDF("vec_id", "seq")
      .write.mode("append").parquet(s"$path/tombstones")
    // the partial batch is INVISIBLE: no half-applied upsert, no
    // delete without its arrival
    assert(rows(m.liveCodes) === afterB1,
      "uncommitted partial batch leaked into the serving view")

    // a reconstructed maintainer counts the orphan seq (so the retry
    // cannot collide with the partial rows) and still serves afterB1
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(m2.batchesSeen === 2, s"seq: ${m2.batchesSeen}")
    assert(rows(m2.liveCodes) === afterB1)
    // the retried batch lands at seq 3 and becomes visible atomically
    m2.onBatch(Some(arrivals2), Some(Seq(3L).toDF("vec_id")))
    val expected = rows(idx.withDeletes(Seq(3L).toDF("vec_id"))
      .append(arrivals1).append(arrivals2).codes)
    assert(rows(m2.liveCodes) === expected, "retried batch wrong")
    // compaction folds only the committed truth (orphans dropped)
    m2.compactNow()
    assert(rows(Sq.load(spark, path).codes) === expected)
  }

  test("a 0-byte or garbled pre-commit marker aborts the commit instead of bricking construction") {
    val corpus = mkCorpus(30)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_garbled").toString + "/idx"
    idx.save(spark, path)
    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals), Some(Seq(3L).toDF("vec_id")))
    val expected = rows(m.liveCodes)

    // the FS anomaly recoverSwap tolerates: the marker's rename target
    // exists but the content never synced (0 bytes) — pre-content crash,
    // so nothing destructive ran; base + logs are fully intact
    m.liveCodes.localCheckpoint()
      .write.mode("overwrite").parquet(s"$path/_compact_tmp/codes")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_lsm_precommit"), Array.empty[Byte])
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(!new java.io.File(s"$path/_lsm_precommit").exists(),
      "garbled marker kept — would re-log the abort on every open")
    assert(!new java.io.File(s"$path/_compact_tmp").exists(),
      "orphan temp dir kept after the aborted commit")
    assert(new java.io.File(s"$path/codes_delta").exists(),
      "logs destroyed by an aborted (never-started) commit")
    assert(rows(m2.liveCodes) === expected, "aborted-commit view wrong")
    assert(m2.batchesSeen === 1, s"seq: ${m2.batchesSeen}")

    // garbled rename line (valid seq, no '>') takes the same abort path
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_lsm_precommit"),
      "1\n_compact_tmp/codescodes".getBytes("UTF-8"))
    val m3 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(!new java.io.File(s"$path/_lsm_precommit").exists())
    assert(rows(m3.liveCodes) === expected)
  }

  test("legacy store (no commit log) backfills at construction; rows stay visible") {
    val corpus = mkCorpus(30)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_legacy").toString + "/idx"
    idx.save(spark, path)
    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals), Some(Seq(3L).toDF("vec_id")))
    val expected = rows(m.liveCodes)
    // simulate a store written BEFORE the commit-record format: the
    // commit log does not exist, but its delta/tombstone rows were
    // committed by the old single-write contract
    def del(p: String): Unit = {
      val f = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(f))
        java.nio.file.Files.walk(f)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.delete(x))
    }
    del(s"$path/batch_commits")
    // a reconstructed maintainer BACKFILLS records for the legacy seqs
    // instead of silently dropping the rows when the filter activates
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 100)
    assert(rows(m2.liveCodes) === expected,
      "legacy rows vanished when the commit filter activated")
    // and a new committed batch coexists with the backfilled ones
    val up = mkCorpus(42, seed = 31).where($"vec_id" >= 40L)
    m2.onBatch(Some(up), None)
    assert(rows(m2.liveCodes) === rows(idx
      .withDeletes(Seq(3L).toDF("vec_id")).append(arrivals).append(up).codes))
  }

  test("LSH store heal finishes a partial multi-dir rename") {
    val corpus = mkCorpus(30)
    val idx = graft.ann.lsh.Lsh.train(corpus, "vec_id", "embedding",
      graft.ann.lsh.LshConfig(nTrees = 2, kMinVecs = 16, seed = 3L))
    val path = java.nio.file.Files
      .createTempDirectory("lsh_lsm_heal").toString + "/idx"
    idx.save(spark, path)
    val m = new graft.ann.lsh.LshMaintainer(spark, path, compactEvery = 100)
    val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30L)
    m.onBatch(Some(arrivals), Some(Seq(4L).toDF("vec_id")))
    val expected = m.index.vectors.collect()
      .map(r => r.getAs[Long]("vec_id")).sorted.toSeq

    // folded store written to the temp dir, marker published, then ONE
    // of the three renames done before the crash
    val live = m.index
    new graft.ann.lsh.LshIndex(live.model,
      live.vectors.localCheckpoint(), live.buckets.localCheckpoint())
      .save(spark, s"$path/_compact_tmp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_lsm_precommit"),
      ("1\n_compact_tmp/model>model\n_compact_tmp/vectors>vectors\n" +
        "_compact_tmp/buckets>buckets").getBytes("UTF-8"))
    def del(p: String): Unit = {
      val f = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(f))
        java.nio.file.Files.walk(f)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.delete(x))
    }
    del(s"$path/model")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$path/_compact_tmp/model"),
      java.nio.file.Paths.get(s"$path/model"))
    // crash here: vectors/buckets still old, logs present, no fence
    val m2 = new graft.ann.lsh.LshMaintainer(spark, path, compactEvery = 100)
    val healed = m2.index
    assert(healed.vectors.collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
      === expected, "healed LSH vectors wrong")
    assert(healed.vectors.groupBy("vec_id").count()
      .where($"count" > 1).count() === 0, "duplicates after heal")
    assert(m2.batchesSeen === 1)
    assert(!new java.io.File(s"$path/_lsm_precommit").exists())
    assert(!new java.io.File(s"$path/vectors_delta").exists())
  }

  test("OPQ codes LSM: frozen rotation+codebooks encode deltas; compaction reloads") {
    val corpus = mkCorpus(40)
    val idx = graft.ann.pq.Opq.train(corpus, "vec_id", "embedding",
      graft.ann.pq.PqConfig(numSubvectors = 4, codesPerSubvector = 8,
        iters = 3, seed = 3L), opqIters = 3)
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_opq").toString + "/idx"
    idx.save(spark, path)

    def enc(df: DataFrame) = idx.model.transform(df, "vec_id", "embedding")
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 2)

    val arrivals = mkCorpus(50, seed = 29).where($"vec_id" >= 40L)
    val dead = Seq(2L, 6L)
    m.onBatch(Some(arrivals), Some(dead.toDF("vec_id")))
    val chain = idx.withDeletes(dead.toDF("vec_id")).append(arrivals)
    assert(rows(m.liveCodes) === rows(chain.codes),
      "OPQ LSM view != in-memory lifecycle chain")

    // batch 2 triggers compaction; Opq.load reopens base + rotation
    m.onBatch(None, None)
    val reloaded = graft.ann.pq.Opq.load(spark, path)
    assert(rows(reloaded.codes) === rows(chain.codes),
      "compacted OPQ base != lifecycle chain")
    assert(reloaded.model.rotation.r.map(_.toSeq).toSeq ===
      idx.model.rotation.r.map(_.toSeq).toSeq,
      "rotation lost through the LSM cycle")
  }

  test("IVF-SQ codes LSM keeps the partitionBy(cell) layout through delta and compaction") {
    val corpus = mkCorpus(40)
    val cfg = IvfSqConfig(nCells = 4, nProbe = 4, iters = 3, seed = 3L)
    val idx = IvfSq.train(corpus, "vec_id", "embedding", cfg)
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_ivfsq").toString + "/idx"
    idx.save(spark, path)

    def enc(df: DataFrame) =
      IvfSq.encode(df, "vec_id", "embedding", cfg, idx.ivf, idx.sq)
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 2,
      partitionCols = Seq("cell"))

    val arrivals = mkCorpus(50, seed = 29).where($"vec_id" >= 40L)
    val dead = Seq(1L, 7L)
    m.onBatch(Some(arrivals), Some(dead.toDF("vec_id")))

    // the delta log is cell-partitioned (probe pruning prunes delta
    // files exactly like base files)
    val deltaDirs = new java.io.File(s"$path/codes_delta").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(deltaDirs.exists(_.startsWith("cell=")),
      s"delta not partitioned by cell: ${deltaDirs.toSeq}")

    val chain = idx.withDeletes(dead.toDF("vec_id")).append(arrivals)
    assert(rows(m.liveCodes) === rows(chain.codes))

    // batch 2 triggers compaction; layout and rows preserved
    m.onBatch(None, None)
    val baseDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(baseDirs.exists(_.startsWith("cell=")),
      s"compacted base lost cell partitioning: ${baseDirs.toSeq}")
    val reloaded = IvfSq.load(spark, path)
    assert(rows(reloaded.codes) === rows(chain.codes))
  }
}
