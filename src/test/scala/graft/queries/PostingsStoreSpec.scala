package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.retrieval.PostingsStore
import graft.text.TextFunctions

/** The stored lexical index ([[PostingsStore]]). Identities under test:
  * the serving views are row-identical to the inline tokenize→tf→df
  * pipelines (so serving from the store changes plans, not numbers);
  * between refits, arrivals score against the fence-time stats (same
  * doc → same rows, unseen terms unscored and measured); deletes/
  * upserts follow the LSM seq rules; [[PostingsStore.mergeRefit]]
  * folds drift into the stats in O(drift) and lands EXACTLY where a
  * full rebuild over the drifted corpus lands; compaction (stats fold
  * + row fold) serves exactly what a fresh build serves; both the
  * refit and the compaction commits heal crashes at construction. */
class PostingsStoreSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def docsOf(path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map { r =>
      r.schema.fieldNames.sorted.map(f => r.get(r.fieldIndex(f)))
        .mkString("|")
    }.toSet

  test("built tables are row-identical to the inline pipelines") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_build").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    assert(rows(store.sparse) === rows(RetrievalQueries.sparseWeights(d, None)))
    assert(rows(store.bm25) === rows(RetrievalQueries.termScores(d, None)))
  }

  test("frozen-stats append: same doc same rows, OOV terms dropped and measured") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_append").toString + "/idx"
    val store = PostingsStore.build(spark, path, d, oovWatermark = 0.9)
    assert(store.lastOovRatio.isEmpty)

    // a verbatim copy of doc 0 under a new id: the frozen encode is
    // deterministic, so its postings equal doc 0's value-for-value
    val copy = d.where($"doc_id" === 0L)
      .select(lit(777777L).as("doc_id"), $"toks")
    store.onBatch(Some(copy), None)
    assert(store.lastOovRatio === Some(0.0))
    def strip(df: DataFrame) = df.select("term", "w")
    assert(rows(strip(store.sparse.where($"doc_id" === 777777L))) ===
      rows(strip(store.sparse.where($"doc_id" === 0L))),
      "frozen re-encode of an identical doc differs")

    // arrivals with unseen terms: the OOV posting gets NO row (it has
    // no df), the known term still lands; the ratio is measured
    val weird = Seq((888888L, Seq("zzzunseenterm", "vector")))
      .toDF("doc_id", "toks")
    store.onBatch(Some(weird), None)
    assert(store.lastOovRatio === Some(0.5), s"oov ${store.lastOovRatio}")
    val got = store.sparse.where($"doc_id" === 888888L)
      .select("term").as[String].collect().toSet
    assert(got === Set("vector"), s"postings for the OOV doc: $got")
  }

  test("a crash between the postings and doc-length writes cannot diverge the views") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_atomic").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    // one COMMITTED batch establishes the commit-record format (a
    // store written before the format is documented legacy-committed)
    store.onBatch(Some(Seq((888888L, Seq("vector")))
      .toDF("doc_id", "toks")), None)
    val sparseBefore = rows(store.sparse)
    val bm25Before = rows(store.bm25)
    // simulate the mid-batch crash at seq 2: tfs_delta written, the
    // doclens_delta row and the commit record never land (a doc with
    // postings but no length would diverge n/avgdl from the rows)
    Seq((999999L, "vector", 1L, 1, 2)).toDF("doc_id", "term", "tf", "dl", "seq")
      .write.mode("append").parquet(s"$path/tfs_delta")
    // BOTH views unchanged — the partial batch is invisible
    assert(rows(store.sparse) === sparseBefore)
    assert(rows(store.bm25) === bm25Before)
    // a committed batch after the crash serves consistently at a
    // fresh seq
    val reopened = new PostingsStore(spark, path, compactEvery = 100)
    assert(reopened.batchesSeen === 2) // the orphan seq is counted
    reopened.onBatch(Some(Seq((999999L, Seq("vector", "query")))
      .toDF("doc_id", "toks")), None)
    assert(reopened.sparse.where($"doc_id" === 999999L).count() === 2)
    assert(reopened.bm25.where($"doc_id" === 999999L).count() === 2)
  }

  test("a failed attempt burns its seq: a same-instance retry cannot double-serve") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_retry").toString + "/idx"
    // compactEvery = 2 so the FAILED attempt lands exactly on a
    // cadence multiple — the fold must be deferred one batch, not a
    // whole cycle (cadence measures from the fence, not divisibility)
    val store = PostingsStore.build(spark, path, d, compactEvery = 2)
    store.onBatch(None, None) // committed batch 1
    // an arrivals frame that fails at evaluation time (assert_true in
    // the filter predicate cannot be pruned away)
    val failing = Seq((777777L, Seq("vector"))).toDF("doc_id", "toks")
      .where(assert_true(lit(false)).isNull)
    intercept[Exception](store.onBatch(Some(failing), None))
    assert(store.batchesSeen === 2, "failed attempt did not burn its seq")
    // the same-instance retry lands at a FRESH seq: even if the failed
    // attempt had left partial log rows, the commit record cannot
    // bless them — and the compaction the burned seq 2 would have run
    // fires HERE instead of waiting for seq 4
    assert(store.compactionDue)
    store.onBatch(Some(Seq((777777L, Seq("vector")))
      .toDF("doc_id", "toks")), None)
    assert(store.batchesSeen === 3)
    assert(!new java.io.File(s"$path/tfs_delta").exists(),
      "burned cadence multiple skipped the compaction cycle")
    assert(store.sparse.where($"doc_id" === 777777L).count() === 1,
      "retry double-served the doc")
  }

  test("serving-view plan: base parquet scan + broadcast anti-joined tombstones") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_plan").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    store.onBatch(None, Some(Seq(1L).toDF("doc_id")))
    val p = store.sparse.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftAnti"), s"tombstone anti-join missing:\n$p")
    assert(p.contains("ResolvedHint") || p.contains("broadcast"),
      s"tombstone broadcast hint missing:\n$p")
    // serving never re-derives weights: no tokenize, no df aggregation
    assert(!p.contains("explode") && !p.contains("string_split"),
      s"serving view recomputes the pipeline:\n$p")
  }

  test("deletes, same-batch upsert, and compaction keep the serving view exact") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_lsm").toString + "/idx"
    val store = PostingsStore.build(spark, path, d, compactEvery = 3)

    // batch 1: delete docs 1 and 2
    store.onBatch(None, Some(Seq(1L, 2L).toDF("doc_id")))
    assert(store.sparse.where($"doc_id".isin(1L, 2L)).count() === 0)
    // batch 2: same-batch delete+arrival of doc 3 = upsert (new toks)
    val newDoc3 = Seq((3L, Seq("vector", "vector", "query")))
      .toDF("doc_id", "toks")
    store.onBatch(Some(newDoc3), Some(Seq(3L).toDF("doc_id")))
    val doc3Terms = store.sparse.where($"doc_id" === 3L)
      .select("term").as[String].collect().toSet
    assert(doc3Terms === Set("vector", "query"), s"upsert lost: $doc3Terms")

    // batch 3 triggers compaction (crash-safe commit): logs gone, the
    // stats fold ran first (compaction == mergeRefit + row fold), so
    // the compacted store serves EXACTLY what a fresh build over the
    // live corpus serves — the strongest identity on offer — and a
    // reopened store agrees
    store.onBatch(None, None)
    assert(!new java.io.File(s"$path/tfs_delta").exists())
    assert(!new java.io.File(s"$path/tombstones").exists())
    val drifted = d.where(!$"doc_id".isin(1L, 2L, 3L))
      .unionByName(newDoc3)
    val fresh = PostingsStore.build(spark,
      java.nio.file.Files.createTempDirectory("postings_lsm_fresh")
        .toString + "/idx", drifted)
    assert(rows(store.sparse) === rows(fresh.sparse),
      "compacted serving != fresh build over the live corpus (sparse)")
    assert(rows(store.bm25) === rows(fresh.bm25),
      "compacted serving != fresh build over the live corpus (bm25)")
    val reopened = new PostingsStore(spark, path, compactEvery = 3)
    assert(reopened.batchesSeen === 3)
    assert(rows(reopened.sparse) === rows(fresh.sparse))
  }

  test("mergeRefit == full rebuild on a drifted corpus, in O(drift) not O(corpus)") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_refit").toString + "/idx"
    // high compactEvery: the refit must do its own folding, no
    // compaction in sight
    val store = PostingsStore.build(spark, path, d, oovWatermark = 0.9)

    // drift: two new docs (one with an OOV term), two deletes, one
    // upsert — every fold direction at once
    val arrivals = Seq(
      (888801L, Seq("vector", "qqzznewterm", "vector")),
      (888802L, Seq("query", "search"))).toDF("doc_id", "toks")
    store.onBatch(Some(arrivals), Some(Seq(5L, 6L).toDF("doc_id")))
    val upsert7 = Seq((7L, Seq("vector", "qqzznewterm")))
      .toDF("doc_id", "toks")
    store.onBatch(Some(upsert7), Some(Seq(7L).toDF("doc_id")))

    // pre-refit: the OOV term's stored raw rows exist but score nothing
    assert(store.sparse.where($"term" === "qqzznewterm").count() === 0,
      "OOV term scored against the fence-time stats")

    assert(store.mergeRefit(), "refit reported no drift")

    // post-refit serving is row-identical to a full rebuild over the
    // drifted corpus — including the previously-OOV term, which now
    // scores retroactively on BOTH its stored docs
    val drifted = d.where(!$"doc_id".isin(5L, 6L, 7L))
      .unionByName(arrivals).unionByName(upsert7)
    val fresh = PostingsStore.build(spark,
      java.nio.file.Files.createTempDirectory("postings_refit_fresh")
        .toString + "/idx", drifted)
    assert(rows(store.sparse) === rows(fresh.sparse),
      "merge-refit sparse != full rebuild")
    assert(rows(store.bm25) === rows(fresh.bm25),
      "merge-refit bm25 != full rebuild")
    assert(store.sparse.where($"term" === "qqzznewterm").count() === 2,
      "previously-OOV rows did not re-score after the refit")

    // a second refit with no new drift is a no-op
    assert(!store.mergeRefit(), "no-drift refit claimed a fold")

    // and the fold composes: more drift after the refit folds again,
    // still rebuild-identical (the fence advanced correctly — no
    // double-count of the first window's deltas)
    store.onBatch(Some(Seq((888803L, Seq("vector")))
      .toDF("doc_id", "toks")), Some(Seq(888801L).toDF("doc_id")))
    assert(store.mergeRefit())
    val drifted2 = drifted.where($"doc_id" =!= 888801L)
      .unionByName(Seq((888803L, Seq("vector"))).toDF("doc_id", "toks"))
    val fresh2 = PostingsStore.build(spark,
      java.nio.file.Files.createTempDirectory("postings_refit_fresh2")
        .toString + "/idx", drifted2)
    assert(rows(store.sparse) === rows(fresh2.sparse),
      "second merge-refit sparse != full rebuild")
    assert(rows(store.bm25) === rows(fresh2.bm25),
      "second merge-refit bm25 != full rebuild")
  }

  test("a seq burned into the stats fence alone is not reused after restart") {
    // the PostingsStore twin of the GraphMaintainer scope-fence bug: a
    // failed batch burns seq N with NO log row; mergeRefit then
    // advances _stats_fence to N (its only trace). Recovery from the
    // logs alone would reuse N — and the reused batch's rows would sit
    // at-or-below the fence, permanently excluded from every fold.
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_burn").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    store.onBatch(Some(Seq((888801L, Seq("vector")))
      .toDF("doc_id", "toks")), None) // committed seq 1
    val failing = Seq((888802L, Seq("vector"))).toDF("doc_id", "toks")
      .where(assert_true(lit(false)).isNull)
    intercept[Exception](store.onBatch(Some(failing), None)) // burns seq 2
    assert(store.mergeRefit()) // folds seq 1's drift; fence -> 2
    val reopened = new PostingsStore(spark, path, compactEvery = 1000)
    assert(reopened.batchesSeen === 2,
      s"burned fence seq reused after restart: ${reopened.batchesSeen}")
    // the next batch lands ABOVE the fence and folds correctly
    reopened.onBatch(Some(Seq((888803L, Seq("vector", "query")))
      .toDF("doc_id", "toks")), None)
    assert(reopened.mergeRefit(), "post-restart batch sat below the fence")
    val fresh = PostingsStore.build(spark,
      java.nio.file.Files.createTempDirectory("postings_burn_fresh")
        .toString + "/idx",
      d.unionByName(Seq((888801L, Seq("vector")),
        (888803L, Seq("vector", "query"))).toDF("doc_id", "toks")))
    assert(rows(reopened.sparse) === rows(fresh.sparse),
      "fold after a burned-fence restart != full rebuild")
  }

  test("a crashed refit commit finishes at construction; a garbled marker aborts") {
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_refit_heal").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    store.onBatch(Some(Seq((888801L, Seq("vector", "vector")))
      .toDF("doc_id", "toks")), None)

    // what a completed refit WOULD produce, from an identical twin
    val twinPath = java.nio.file.Files
      .createTempDirectory("postings_refit_twin").toString + "/idx"
    val twin = PostingsStore.build(spark, twinPath, d)
    twin.onBatch(Some(Seq((888801L, Seq("vector", "vector")))
      .toDF("doc_id", "toks")), None)
    twin.mergeRefit()
    val want = rows(twin.sparse)

    // crash window: new stats/meta fully written to the temp dir +
    // marker published, CRASH before any rename — construction must
    // finish the commit
    spark.read.parquet(s"$twinPath/stats").write.mode("overwrite")
      .parquet(s"$path/_refit_tmp/stats")
    spark.read.parquet(s"$twinPath/meta").write.mode("overwrite")
      .parquet(s"$path/_refit_tmp/meta")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_postings_refit"),
      "1".getBytes("UTF-8"))
    val healed = new PostingsStore(spark, path, compactEvery = 1000)
    assert(!new java.io.File(s"$path/_postings_refit").exists(),
      "refit marker kept after heal")
    assert(rows(healed.sparse) === want, "healed refit serving wrong")
    // the healed fence is durable: no drift since seq 1 -> no-op
    assert(!healed.mergeRefit(), "healed fence lost (refold attempted)")

    // garbled marker: pre-content crash, nothing destructive ran —
    // construction discards it and the store serves the PRE-refit view
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_postings_refit"),
      Array.empty[Byte])
    val ok = new PostingsStore(spark, path, compactEvery = 1000)
    assert(!new java.io.File(s"$path/_postings_refit").exists())
    assert(rows(ok.sparse) === want)
  }

  test("a lost stats fence cannot silently re-inflate folded stats") {
    // insert-only drift is the hole the negative-fold require can't
    // see: with `_stats_fence` lost after a refit, a fold from 0 would
    // re-count every already-folded arrival as a fresh df/n/tdl
    // increment — pure inflation, nothing goes negative. Since the
    // fence is embedded in meta (stats_seq, swapped WITH the stats),
    // the marker loss must be RECOVERED, not just refused.
    val d = docsOf(sf("sf0.001") + "/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("postings_fence_lost").toString + "/idx"
    val store = PostingsStore.build(spark, path, d)
    store.onBatch(Some(Seq((888801L, Seq("vector", "query")))
      .toDF("doc_id", "toks")), None)
    assert(store.mergeRefit()) // arrivals folded; fence -> 1
    val metaAfter = spark.read.parquet(s"$path/meta").head()
    val nAfter = metaAfter.getAs[Long]("n")
    assert(metaAfter.getAs[Int]("stats_seq") === 1,
      "refit must embed the fence in meta")
    val statsAfter = rows(spark.read.parquet(s"$path/stats"))
    // simulate the marker loss: the embedded copy takes over — the
    // reopened store's next fold is a no-op, not a double-fold
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_stats_fence"))
    val reopened = new PostingsStore(spark, path, compactEvery = 1000)
    assert(reopened.batchesSeen === 1,
      "embedded fence must keep the recovered seq")
    assert(!reopened.mergeRefit(),
      "marker loss must not re-fold the already-folded window")
    assert(rows(spark.read.parquet(s"$path/stats")) === statsAfter &&
      spark.read.parquet(s"$path/meta").head().getAs[Long]("n") === nAfter,
      "marker loss re-inflated the folded stats")

    // a PRE-stats_seq store (legacy meta) with a lost marker: the
    // fence-0 cross-check refuses the doc-count-changing double-fold
    // loudly instead of folding from 0
    import org.apache.spark.sql.functions.col
    val legacyMeta = spark.read.parquet(s"$path/meta")
      .select(col("n"), col("avgdl"), col("tdl")).collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacyMeta.toIndexedSeq),
        spark.read.parquet(s"$path/meta")
          .select("n", "avgdl", "tdl").schema)
      .write.mode("overwrite").parquet(s"$path/meta_legacy")
    // swap in the legacy-format meta
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/meta_legacy"),
      new org.apache.hadoop.fs.Path(s"$path/meta"))
    val legacy = new PostingsStore(spark, path, compactEvery = 1000)
    val e = intercept[IllegalArgumentException](legacy.mergeRefit())
    assert(e.getMessage.contains("_stats_fence"),
      s"wrong refusal: ${e.getMessage}")

    // and a legitimately-fresh store (true fence 0) still refits fine
    val fresh = PostingsStore.build(spark, java.nio.file.Files
      .createTempDirectory("postings_fence_fresh").toString + "/idx", d)
    fresh.onBatch(Some(Seq((888802L, Seq("vector")))
      .toDF("doc_id", "toks")), None)
    assert(fresh.mergeRefit(), "fence-0 cross-check broke the legit path")
  }
}
