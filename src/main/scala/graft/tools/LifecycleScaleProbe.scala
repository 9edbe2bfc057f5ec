package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.lsh.{Lsh, LshConfig, LshMaintainer}

/** Index-lifecycle scale probe: what the LSM serving view costs at 1M.
  *
  * The lifecycle story (SCALE.md "Index lifecycle at 100 TB") claims
  * tombstone deletes and frozen-model delta appends are serve-time
  * VIEWS — a broadcast anti-join and a union over the stored base —
  * whose overhead a query batch barely notices, with the scheduled
  * compaction folding the logs away. This probe measures each leg at
  * corpus scale:
  *
  *   1. baseline: search the freshly-saved store (no logs);
  *   2. after a 1% tombstone batch: same search through the live view
  *      (anti-join overhead), plus the never-serve-a-deleted-id check;
  *   3. after a 10k-arrival append batch (frozen-forest hash, delta
  *      parquet): same search (union + anti-join overhead);
  *   4. compactNow (the rewrite), then the post-compaction search
  *      (back to the no-log plan over the folded base).
  *
  * Corpus: the GraphScaleProbe generator (64-d, 10-point clusters,
  * xxhash-derived — deterministic, no RNG). Queries: 100 corpus
  * vectors. Each search timed twice, min reported (page-cache warm).
  *
  * Usage: runMain graft.tools.LifecycleScaleProbe [n]
  */
object LifecycleScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def emb(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(floor(col("id") / 10), i), lit(2000))
          .cast("double") - 1000.0) / 250.0
          + (pmod(xxhash64(col("id"), i), lit(2000))
            .cast("double") - 1000.0) / 5000.0).as("embedding"))

    val corpus = emb(spark.range(n)).persist()
    corpus.count()
    val queries = corpus.where(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val threshold = 1.4

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def min2(f: => Long): (Long, Double) = {
      val (r1, t1) = time(f); val (_, t2) = time(f)
      (r1, math.min(t1, t2))
    }

    val path = "/tmp/graft_lifecycle_probe_idx"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)

    val (_, tTrain) = time {
      Lsh.train(corpus, "vec_id", "embedding",
          LshConfig(nTrees = 10, kMinVecs = 80, seed = 42L,
            sampleCap = 100000))
        .save(spark, path)
    }
    println(f"### train+save n=$n%d: $tTrain%.1f s")

    val base = Lsh.load(spark, path)
    val (nBase, tBase) = min2(
      base.searchAll(queries, 10, threshold).count())
    println(f"### baseline search: $tBase%.2f s ($nBase rows)")

    val m = new LshMaintainer(spark, path, compactEvery = 1000)

    // batch 1: tombstone 1% (vec_id % 100 == 0)
    val dead = corpus.where(pmod(col("vec_id"), lit(100)) === 0)
      .select("vec_id")
    val (_, tDel) = time(m.onBatch(None, Some(dead)))
    val (nDelView, tDelView) = min2(
      m.index.searchAll(queries, 10, threshold).count())
    val leaked = m.index.searchAll(queries, 10, threshold)
      .where(pmod(col("vec_id"), lit(100)) === 0).count()
    println(f"### +1%% tombstones: log $tDel%.2f s, view search " +
      f"$tDelView%.2f s ($nDelView rows, $leaked deleted served)")

    // batch 2: append 10k arrivals through the frozen forest
    val arrivals = emb(spark.range(n, n + 10000))
    val (_, tApp) = time(m.onBatch(Some(arrivals), None))
    val (nAppView, tAppView) = min2(
      m.index.searchAll(queries, 10, threshold).count())
    println(f"### +10k append: delta $tApp%.2f s, view search " +
      f"$tAppView%.2f s ($nAppView rows)")

    // compaction folds both logs into the base
    val (_, tCompact) = time(m.compactNow())
    val folded = Lsh.load(spark, path)
    val (nPost, tPost) = min2(
      folded.searchAll(queries, 10, threshold).count())
    val liveN = folded.vectors.count()
    println(f"### compaction: $tCompact%.1f s; post search $tPost%.2f s " +
      f"($nPost rows, $liveN live vectors)")

    // ---- serve latency vs LOG DEPTH (round 13) ----
    // Every serving view stacks visibleFilter (fence + commit-record
    // joins) + the tombstone anti-join over base ∪ delta; each batch
    // adds parquet fragments to both logs. 100 small batches (500
    // arrivals + 100 deletes each), the view search timed at growing
    // depths, then one compaction to show the base plan restored — the
    // curve a compactEvery default must be read off.
    val measureAt = Set(1, 5, 10, 25, 50, 100)
    var nextId = n + 10000L
    var logged = 0.0
    (1 to 100).foreach { b =>
      val arr = emb(spark.range(nextId, nextId + 500))
      val del = spark.range(nextId - 200, nextId - 100)
        .select(col("id").as("vec_id"))
      val (_, t) = time(m.onBatch(Some(arr), Some(del)))
      logged += t
      nextId += 500
      if (measureAt(b)) {
        val (nV, tV) = min2(m.index.searchAll(queries, 10, threshold).count())
        println(f"### log depth $b%3d batches: view search $tV%.2f s " +
          f"($nV rows; $logged%.1f s logging so far)")
      }
    }
    val (_, tC2) = time(m.compactNow())
    val (nP2, tP2) = min2(m.index.searchAll(queries, 10, threshold).count())
    println(f"### compaction after 100 batches: $tC2%.1f s; " +
      f"post search $tP2%.2f s ($nP2 rows)")
    spark.stop()
  }
}
