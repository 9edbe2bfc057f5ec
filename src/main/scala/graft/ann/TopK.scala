package graft.ann

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed per-key top-k as a partial aggregation instead of a window
  * sort — the 100 TB-scale form of the reference's min-heap top-k
  * (lsh/lsh.go:22-45,192-195; SURVEY.md §2 O13f "v2").
  *
  * `row_number() OVER (PARTITION BY query ORDER BY dist)` must shuffle
  * EVERY scored candidate row to sort it; this Aggregator keeps a bounded
  * buffer of the best k per (partition, query) map-side, so the shuffle
  * moves at most `numPartitions * k` rows per query regardless of corpus
  * size. At 1000 executors over 100 TB that is the difference between
  * shuffling the corpus and shuffling kilobytes.
  *
  * Determinism: ordering is (dist, vec_id) everywhere — including the
  * capacity eviction — so the result is identical to the window
  * formulation (ties pinned by vec_id, SURVEY.md §7.4). The buffer is a
  * sorted Seq capped at k; k is small (10-100), so per-row insertion cost
  * is trivial next to the distance computation it aggregates.
  */
object TopK {

  final case class Neighbor(vec_id: Long, dist: Double)

  private def lt(a: Neighbor, b: Neighbor): Boolean =
    a.dist < b.dist || (a.dist == b.dist && a.vec_id < b.vec_id)

  final class TopKAggregator(k: Int)
      extends Aggregator[Neighbor, Seq[Neighbor], Seq[Neighbor]] {

    override def zero: Seq[Neighbor] = Seq.empty

    private def insert(buf: Seq[Neighbor], n: Neighbor): Seq[Neighbor] = {
      val i = buf.indexWhere(b => lt(n, b)) match {
        case -1 => buf.length
        case x  => x
      }
      (buf.take(i) :+ n) ++ buf.drop(i)
    }

    override def reduce(buf: Seq[Neighbor], n: Neighbor): Seq[Neighbor] =
      if (buf.length < k) insert(buf, n)
      else if (lt(n, buf.last)) insert(buf.dropRight(1), n)
      else buf

    override def merge(a: Seq[Neighbor], b: Seq[Neighbor]): Seq[Neighbor] =
      b.foldLeft(a)(reduce)

    override def finish(buf: Seq[Neighbor]): Seq[Neighbor] = buf

    override def bufferEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder()
  }

  /** Column form: `topK(k)(vec_id, dist)` aggregates to
    * `array<struct<vec_id, dist>>` ascending by (dist, vec_id). */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[Neighbor])
    (id: Column, dist: Column) => agg(id, dist)
  }
}
