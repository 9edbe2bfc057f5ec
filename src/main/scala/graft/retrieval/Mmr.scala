package graft.retrieval

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Greedy MMR selection (Carbonell & Goldstein, SIGIR 1998) as a bounded
  * per-query partial aggregation — the scale form of
  * `RetrievalQueries.mmrSelect`'s unrolled-join reference
  * implementation (row-identical, MmrSpec).
  *
  * Why an Aggregator: the greedy loop is k data-dependent argmax steps.
  * As dataframe joins that is ~6 tiny 32-partition shuffles per step —
  * at sf0.1 the measured cost was 23 s of pure stage-scheduling latency
  * on ≤50-row frames. Per query, though, the whole problem is bounded
  * (≤ depth rel rows + depth² sim rows), which is exactly the
  * [[graft.ann.TopK]] situation: ship the rows to ONE reducer per query
  * and run the loop in memory. One shuffle, k×depth comparisons per
  * query, corpus-size-independent by construction.
  *
  * Determinism contract (identical to the unrolled form and the DuckDB
  * oracle): scores rounded to 6 (HALF_UP, Catalyst `round` semantics)
  * before each argmax, ties broken by ascending doc_id.
  */
object Mmr {

  /** Tagged input row: kind 0 = candidate (a=doc_id, v=rel);
    * kind 1 = pair similarity (a, b, v=sim). */
  final case class MmrRow(kind: Int, a: Long, b: Long, v: Double)
  final case class CandE(d: Long, r: Double)
  final case class SimE(a: Long, b: Long, s: Double)
  final case class MmrBuf(cands: Seq[CandE], sims: Seq[SimE])
  final case class PickE(rank: Long, doc_id: Long, score: Double)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  final class MmrAggregator(k: Int, lambda: Double)
      extends Aggregator[MmrRow, MmrBuf, Seq[PickE]] {

    override def zero: MmrBuf = MmrBuf(Vector.empty, Vector.empty)

    override def reduce(b: MmrBuf, r: MmrRow): MmrBuf =
      if (r.kind == 0) b.copy(cands = b.cands :+ CandE(r.a, r.v))
      else b.copy(sims = b.sims :+ SimE(r.a, r.b, r.v))

    override def merge(x: MmrBuf, y: MmrBuf): MmrBuf =
      MmrBuf(x.cands ++ y.cands, x.sims ++ y.sims)

    override def finish(b: MmrBuf): Seq[PickE] = {
      val rel = b.cands.map(c => c.d -> c.r).toMap
      val sim = b.sims.map(s => (s.a, s.b) -> s.s).toMap
      val remaining = scala.collection.mutable.TreeSet.empty[Long] ++ rel.keys
      val selected = ArrayBuffer.empty[Long]
      val out = ArrayBuffer.empty[PickE]
      var rank = 1L
      while (rank <= k && remaining.nonEmpty) {
        var bestDoc = -1L
        var bestScore = Double.NegativeInfinity
        // TreeSet iteration is ascending doc_id, so strict > keeps the
        // lowest doc_id among ties — the shared tie rule.
        remaining.foreach { d =>
          // candidates with NO sim row to any selected node are skipped
          // for this round — the same semantics as the unrolled
          // reference's inner join (and it keeps the score finite: a
          // -Infinity maxsim would otherwise make the round-6 rounding
          // throw). With the dense pairwise sims the queries build,
          // this branch never fires.
          var ms = Double.NegativeInfinity
          if (selected.nonEmpty) selected.foreach { p =>
            val v = sim.getOrElse((d, p), Double.NegativeInfinity)
            if (v > ms) ms = v
          }
          if (selected.isEmpty || ms != Double.NegativeInfinity) {
            val s =
              if (selected.isEmpty) r6(rel(d))
              else r6(lambda * rel(d) - (1 - lambda) * ms)
            if (s > bestScore) { bestScore = s; bestDoc = d }
          }
        }
        if (bestDoc < 0) {
          // every remaining candidate lacked sims to the selected set —
          // nothing comparable left to pick (mirrors the reference form
          // returning fewer than k rows on sparse sims)
          remaining.clear()
        } else {
          out += PickE(rank, bestDoc, bestScore)
          selected += bestDoc
          remaining -= bestDoc
          rank += 1
        }
      }
      out.toSeq
    }

    override def bufferEncoder: Encoder[MmrBuf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[PickE]] = ExpressionEncoder()
  }

  /** Aggregator-form MMR over the same (cand, sims) inputs as the
    * unrolled reference: one query_id-keyed shuffle, greedy loop in
    * memory per query. Returns (query_id, rank, doc_id, mmr_score). */
  def select(cand: DataFrame, sims: DataFrame, k: Int,
             lambda: Double): DataFrame = {
    val agg = udaf(new MmrAggregator(k, lambda), Encoders.product[MmrRow])
    val rows = cand.select(col("query_id"), lit(0).as("kind"),
        col("doc_id").as("a"), lit(-1L).as("b"), col("rel").as("v"))
      .unionByName(sims.select(col("query_id"), lit(1).as("kind"),
        col("a"), col("b"), col("sim").as("v")))
    rows.groupBy("query_id")
      .agg(agg(col("kind"), col("a"), col("b"), col("v")).as("picks"))
      .select(col("query_id"), explode(col("picks")).as("p"))
      .select(col("query_id"), col("p.rank").as("rank"),
        col("p.doc_id").as("doc_id"), col("p.score").as("mmr_score"))
  }
}
