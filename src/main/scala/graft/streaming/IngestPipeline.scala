package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.{CodesMaintainer, GraphMaintainer}
import graft.retrieval.PostingsStore
import graft.text.DedupGate

/** The COMPOSED ingestion lifecycle — one arrivals micro-batch flowing
  * through every maintained store from the same `foreachBatch` body,
  * the shape a 100 TB deployment actually runs (each store's
  * maintenance loop is certified in isolation elsewhere; this is the
  * one-batch, one-decision composition):
  *
  *   1. [[graft.text.DedupGate]] decides the ADMITTED set once
  *      (near-dup arrivals rejected against the stored band index and
  *      within the batch, min-id canonical);
  *   2. [[graft.retrieval.PostingsStore]] appends the admitted docs'
  *      postings (doc_id, toks);
  *   3. [[graft.ann.CodesMaintainer]] encodes + appends the admitted
  *      embeddings through its frozen model;
  *   4. [[graft.ann.GraphMaintainer]] beam-inserts the admitted
  *      vectors into the serving graph.
  *
  * Deletes fan out to all four in the same batch. The consistency cut:
  * every store sees exactly the same admitted set (the gate's decision
  * is materialized once and shared — a store can never ingest a doc
  * another store rejected), and each store's batch is individually
  * atomic (the LSM batch-commit record). Cross-store atomicity is BY
  * REPLAY, not by transaction: a crash between two stores' appends
  * leaves the earlier store one batch ahead; the stream checkpoint
  * replays the batch and every store treats the re-arrival as an
  * upsert — the gate never pairs a doc against its own id, postings/
  * codes tombstone-free re-appends supersede by seq, and the graph's
  * insert path anti-joins the delta against rows it would duplicate —
  * so the composed end state converges (the same contract each store's
  * own streaming spec pins, here pinned jointly by
  * StreamingIngestPipelineSpec).
  *
  * Schema contract: `arrivals` carries (`idCol`, `textCol`, `toksCol`,
  * `vecCol`); the graph maintainer must be constructed with
  * idCol = "vec_id" over `vecCol` (the pipeline renames `idCol` →
  * vec_id for the vector-keyed stores); `deletes` carries (`idCol`).
  *
  * `vectors` is the LIVE corpus view plus this batch's arrivals
  * (vec_id, `vecCol`) — the graph's scoring AND refine basis, so it
  * must NOT carry ids rejected in EARLIER batches (a scheduled refine
  * treats vectors ∖ tombstones as the corpus and would backbone a
  * rejected id back in). The natural construction satisfies this for
  * free: base corpus ∪ each prior batch's `report.admittedRows` ∪ the
  * current batch's arrivals — the pipeline itself strips the CURRENT
  * batch's rejections before the graph call (the caller cannot know
  * them yet), and prior batches' rejections never entered the union.
  * StreamingIngestPipelineSpec models exactly this construction.
  *
  * `entriesFor` maps the admitted (vec_id, `vecCol`) rows to the
  * walk's per-query entry set (query_id, node) — fixed ids or
  * coarse-index seeds.
  */
final class IngestPipeline(
    gate: DedupGate,
    postings: PostingsStore,
    codes: CodesMaintainer,
    graph: GraphMaintainer,
    entriesFor: DataFrame => DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    toksCol: String = "toks",
    vecCol: String = "embedding") {

  /** One composed maintenance step — safe as a `foreachBatch` body
    * (driver-side state is each store's one Int; everything heavy is
    * DataFrame jobs). Returns the batch report; `report.admitted` is
    * materialized, so reading it later cannot replay the gate. */
  def onBatch(arrivals: DataFrame, vectors: DataFrame,
              deletes: Option[DataFrame] = None): IngestPipeline.Report = {
    val delIds = deletes.map(_.select(col(idCol)))
    val res = gate.onBatch(arrivals, delIds)
    // the one consistency cut: the admitted set is decided ONCE,
    // materialized, and every downstream store ingests exactly it
    val admitted = res.admitted.localCheckpoint()
    val admittedVecs = admitted
      .select(col(idCol).as("vec_id"), col(vecCol))
    postings.onBatch(
      Some(admitted.select(col(idCol).as("doc_id"), col(toksCol))),
      delIds.map(_.select(col(idCol).as("doc_id"))))
    codes.onBatch(Some(admittedVecs),
      delIds.map(_.select(col(idCol).as("vec_id"))))
    // the graph's vectors view is its LIVE basis (a scheduled refine
    // treats vectors ∖ tombstones as the corpus — backbone edges are
    // built for every row), so rejected arrivals must not ride along:
    // a rejected id in `vectors` would re-enter the graph at the next
    // refine even though no store admitted it. Bounded anti-join — the
    // rejection set is batch-sized.
    val graphVectors = vectors.join(
      broadcast(res.rejected.select(col("doc_id").as("vec_id"))),
      Seq("vec_id"), "left_anti")
    graph.onBatch(graphVectors, admittedVecs, entriesFor(admittedVecs),
      delIds.map(_.select(col(idCol).as("vec_id"))))
    IngestPipeline.Report(
      arrived = arrivals.count(),
      admitted = admitted.count(),
      rejected = res.rejected,
      admittedRows = admitted)
  }
}

object IngestPipeline {
  /** One composed batch's outcome: counts plus the materialized
    * admitted rows and the gate's (doc_id, cluster_id) rejections. */
  final case class Report(arrived: Long, admitted: Long,
                          rejected: DataFrame, admittedRows: DataFrame)
}
