package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_token_budget`'s per-source token-budget cut:
  * per-source state is ONE running token total (bounded regardless of
  * stream length), each doc is admitted iff its START offset is still
  * under the budget — the same "count every doc, keep the prefix" rule
  * as the batch window form, so a kept/dropped decision never needs
  * revisiting.
  *
  * Order caveat (the funnel's, verbatim): the batch twin orders each
  * source's docs by the md5-shuffled key; the streaming form is exactly
  * equivalent only when docs arrive in that order across micro-batches
  * (within a batch it sorts by the same key — [[jvmHash60]] mirrors
  * `TextFunctions.hash60(21, _)` bit-for-bit, StreamingBudgetSpec
  * proves stream==batch row-identically on the real documents table).
  * In a deployment the budget cut runs on the ingest stream's own
  * arrival order — the cut is then "first come first kept", which is
  * the semantics a live ingest wants anyway. */
object BudgetStream {

  final case class DocTok(doc_id: Long, source: String, n_toks: Long)
  final case class BudgetState(used: Long)
  final case class BudgetRow(doc_id: Long, source: String, n_toks: Long,
                             kept: Boolean)

  /** JVM mirror of `TextFunctions.hash60(seed, s)`: first 15 hex chars
    * of md5("seed:s") as an unsigned long. */
  def jvmHash60(seed: Int, s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$s".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def tokenBudget(docs: Dataset[DocTok], budget: Long): Dataset[BudgetRow] = {
    import docs.sparkSession.implicits._
    def update(source: String, it: Iterator[DocTok],
               state: GroupState[BudgetState]): Iterator[BudgetRow] = {
      var used = state.getOption.map(_.used).getOrElse(0L)
      val out = it.toArray
        .sortBy(d => (jvmHash60(21, d.doc_id.toString), d.doc_id))
        .map { d =>
          val kept = used < budget
          used += d.n_toks
          BudgetRow(d.doc_id, d.source, d.n_toks, kept)
        }
      state.update(BudgetState(used))
      out.iterator
    }
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, BudgetRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
