package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Plan pins for the round-11 operators: the scale-sensitive shape
  * claims their scaladocs make must be visible in the optimized plan,
  * not just asserted in prose. */
class NewOpsPlanSpec extends AnyFunSuite with SparkSpecBase {

  private def plan(q: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame],
                   name: String): String =
    q(name)(spark, sf("sf0.001")).queryExecution.optimizedPlan.toString

  test("q_knn_classify: vote tie-break is aggregate-only — no window anywhere") {
    val p = plan(StatsQueries.queries, "q_knn_classify")
    assert(!p.contains("Window"), s"per-query window leaked into the vote:\n$p")
  }

  test("q_embedding_drift: dim-keyed aggregates, no corpus-sized join key") {
    val p = plan(StatsQueries.queries, "q_embedding_drift")
    assert(!p.contains("Window"), p)
    // the only joins are on pos (dims-sized); vec_id never joins
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty)
    assert(joins.forall(j => j.contains("pos") && !j.contains("vec_id")),
      s"drift must join on the dims-sized pos key only:\n${joins.mkString("\n")}")
  }

  test("q_sparse_dot_topk: no window; query weights broadcast into the score join") {
    val p = plan(RetrievalQueries.queries, "q_sparse_dot_topk")
    // ranking tail is the bounded TopK aggregation, never a window sort
    assert(!p.contains("Window"), s"window leaked into the rank tail:\n$p")
    // the (small) query-weight side rides a broadcast hint into the
    // term join — the corpus postings never shuffle against it
    assert(p.contains("ResolvedHint") || p.contains("broadcast"),
      s"query-weight broadcast hint missing:\n$p")
  }

  test("q_bm25_topk serves from the stored postings: no tokenize/explode in the plan") {
    val p = plan(RetrievalQueries.queries, "q_bm25_topk")
    // round 12: the per-(doc, term) scores come from the persisted
    // postings table — the corpus tokenize→tf→df pipeline must be
    // ABSENT from the serving plan (it ran once at build). The only
    // Generate is topDesc's own posexplode over the bounded TopK
    // buffer; exploding the documents' token arrays would show as
    // explode(toks…)/the tokenizer's split.
    assert(!p.contains("explode(toks"), s"inline tokenize leaked back:\n$p")
    // the tokenizer renders as the split(...) CALL — a bare "split"
    // substring also matches Range leaves' "splits=Some(n)" (the
    // store's empty-log fallbacks since the raw-postings layout)
    assert(!p.contains("split("), s"inline tokenize leaked back:\n$p")
    assert(!p.contains("Window"), p)
    assert(p.contains("tscore"), s"stored score column missing:\n$p")
  }

  test("q_autotune_graph_beam grade: aggregates only, no window, no corpus join") {
    val p = plan(GraphQueries.queries, "q_autotune_graph_beam")
    assert(!p.contains("Window"), s"window leaked into the grade:\n$p")
    // the grade joins the (bounded) dump against the memoized GT —
    // the embeddings table itself must not appear in the final frame
    assert(!p.contains("embeddings.parquet"),
      s"grade re-reads the corpus:\n$p")
  }

  test("q_diverse_sample: no window; centroids broadcast; bounded TopK cut") {
    val p = plan(SimilarityQueries.queries, "q_diverse_sample")
    assert(!p.contains("Window"), s"per-cell window leaked into the cut:\n$p")
    assert(p.contains("topk"), s"bounded TopK aggregator missing:\n$p")
  }

  test("OPQ codes build: rotation + encode are one map-side projection over the scan") {
    // q_opq_recall's returned frame reads the prediction dumps, so the
    // shape claim lives on the CODES build: rotate-then-encode must be
    // a plain Project on the parquet scan — no join, no shuffle, no
    // window between the scan and the code table
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val idx = graft.ann.pq.Opq.train(e, "vec_id", "embedding",
      graft.ann.pq.PqConfig(numSubvectors = 16, codesPerSubvector = 16,
        seed = 42L))
    val p = idx.codes.queryExecution.optimizedPlan.toString
    assert(p.contains("pq_encode(opq_rotate("), s"fused projection missing:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"codes build must be scan + project only:\n$p")
    // Exchange is a PHYSICAL node — the no-shuffle half of the claim
    // must be pinned on the executed plan, not the logical one
    val phys = idx.codes.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"),
      s"codes build shuffled between scan and code table:\n$phys")
  }

  test("incremental near-dup: arrivals side broadcast, base bands never") {
    val cfg = graft.text.Dedup.MinHashConfig(maxDocFreqRatio = 1.0)
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val base = d.where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0)
    val arrivals = d.where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
    val bands = graft.text.Dedup.bandIndex(base, "doc_id", "text", cfg)
    val res = graft.text.Dedup.minhashNearDupIncremental(
      bands, arrivals, "doc_id", "text", cfg)
    // the result is materialized (materializeRelease), so the join
    // shape lives in the cached PHYSICAL plan inside InMemoryRelation
    val cached = res.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }
    assert(cached.nonEmpty, res.queryExecution.optimizedPlan.toString)
    val p = cached.head
    // base-vs-arrivals candidates join on (band, bkey) planned as a
    // broadcast hash join (the batch-sized arrivals side is the build)
    assert(p.contains("BroadcastHashJoin [band"), p)
    res.unpersist()
  }
}
