package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed keys — the manual fallback when AQE's skew
  * handling can't apply (e.g. skewed aggregation into a custom
  * aggregator, or a skewed window partition).
  *
  * Two-phase shape: phase 1 groups on (key, salt) so one hot key's rows
  * spread over `saltFactor` reducers; phase 2 merges the partials on the
  * key alone — the second shuffle moves at most `saltFactor` rows per
  * key. Correct for any algebraic aggregate (sum/count/min/max and
  * compositions like top-k buffers).
  *
  * The salt is derived deterministically from stable columns (not
  * rand()) so replays/retries see the same distribution — at 100 TB,
  * nondeterministic salting breaks speculative-execution and stage-retry
  * correctness for non-idempotent sinks.
  */
object Salt {

  /** Deterministic salt in [0, saltFactor) from arbitrary columns. */
  def saltFrom(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor))

  /** Salted count per key: groupBy(key, salt) -> groupBy(key). */
  def saltedCount(df: DataFrame, key: Column, saltFactor: Int,
                  saltCols: Seq[Column]): DataFrame =
    df.groupBy(key.as("key"), saltFrom(saltFactor, saltCols: _*).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("n"))

  /** Salted sum of `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltFactor: Int,
                saltCols: Seq[Column]): DataFrame =
    df.groupBy(key.as("key"), saltFrom(saltFactor, saltCols: _*).as("salt"))
      .agg(sum(value).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("total"))

  /** Salted per-key top-k (ascending `order`): each salt bucket keeps its
    * local top-k via the bounded aggregator, the merge keeps the global
    * top-k — the skew-proof form of the ANN per-query window. */
  def saltedTopK(df: DataFrame, key: Column, id: Column, order: Column,
                 k: Int, saltFactor: Int): DataFrame = {
    val topk = graft.ann.TopK.topK(k)
    df.groupBy(key.as("key"), saltFrom(saltFactor, id).as("salt"))
      .agg(topk(id, order).as("nn"))
      .select(col("key"), explode(col("nn")).as("n"))
      .groupBy("key")
      .agg(topk(col("n.vec_id"), col("n.dist")).as("nn"))
      .select(col("key"), explode(col("nn")).as("n"))
      .select(col("key"), col("n.vec_id").as("id"), col("n.dist").as("ord"))
  }
}
