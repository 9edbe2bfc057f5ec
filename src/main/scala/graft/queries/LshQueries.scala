package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** LSH index/search driver queries (reference O1-O13). Seeded-random
  * hashing is not SQL-expressible, so these carry no DuckDB oracle
  * (rows-only driver check, SURVEY.md §2.13); their correctness gate is
  * the ScalaTest/property suite (ForestSpec, LshIndexSpec) plus
  * `q_lsh_recall`'s per-query recall against the exact-NN ground truth
  * computed in the same job. */
object LshQueries extends QueryPack {

  /** Thresholds sized to the synthetic embeddings table (64-d float):
    * pairwise L2 ∈ [1.0, 1.7] with 10-NN under ~1.25; cosine ∈ [0.5, 1.2]
    * with near-neighbors under ~0.8. */
  val L2Threshold = 1.3
  val CosineThreshold = 0.85
  val K = VectorQueries.K

  /** Operating point from a recall/time sweep on the synthetic
    * embeddings: recall 1.0 at sf0.01 and 0.94 at sf0.1 (the reference's
    * published Euclidean operating points are 0.94-0.95, BASELINE.md) at
    * ~2s search; more trees buy little beyond this on 64-d data. */
  def config(angular: Boolean): LshConfig =
    LshConfig(nTrees = 20, kMinVecs = 80, angular = angular, seed = 42L)

  private def queriesDf(emb: DataFrame): DataFrame =
    emb.orderBy("vec_id").limit(VectorQueries.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Index-build occupancy: per-tree bucket count / entries (O1-O8).
    "q_lsh_bucket_stats" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Lsh.train(emb, "vec_id", "embedding", config(angular = false)).bucketStats
    }),

    // Flagship ANN search, L2 (O13 full pipeline). Every row carries a
    // self-graded `valid` flag (exact-distance recompute + threshold in
    // the same job — pred ⊆ brute-force-at-threshold, Eval.withValidity).
    "q_lsh_search_l2" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val q = queriesDf(emb)
      val idx = Lsh.train(emb, "vec_id", "embedding", config(angular = false))
      Eval.withValidity(idx.searchAll(q, K, L2Threshold, ExactNN.L2),
          emb, q, ExactNN.L2, L2Threshold)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // ANN search, cosine (angular indexing path, hasher.go:121-132).
    "q_lsh_search_cosine" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val q = queriesDf(emb)
      val idx = Lsh.train(emb, "vec_id", "embedding", config(angular = true))
      Eval.withValidity(idx.searchAll(q, K, CosineThreshold, ExactNN.Cosine),
          emb, q, ExactNN.Cosine, CosineThreshold)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Per-query recall of LSH vs exact NN at the same threshold (O17
    // grading O13) — the reference's README benchmark loop as one query.
    "q_lsh_recall" -> ((s, dir) =>
      recall(s, dir, angular = false, ExactNN.L2, L2Threshold)),

    // Angular variant (the reference publishes cosine recall separately
    // and acknowledges degradation there, README.md:164-167).
    "q_lsh_recall_cosine" -> ((s, dir) =>
      recall(s, dir, angular = true, ExactNN.Cosine, CosineThreshold))
  )

  private def recall(s: SparkSession, dir: String, angular: Boolean,
                     metric: ExactNN.Metric, threshold: Double): DataFrame = {
    val emb = tbl(s, dir, "embeddings")
    val q = queriesDf(emb)
    val idx = Lsh.train(emb, "vec_id", "embedding", config(angular))
    val pred = idx.searchAll(q, K, threshold, metric)
    val gt = ExactNN.topK(q, emb, K, metric, threshold = Some(threshold))
    Eval.setPrecisionRecall(pred, gt)
      .agg(
        round(avg("precision"), 4).as("avg_precision"),
        round(avg("recall"), 4).as("avg_recall"),
        count(lit(1)).as("n_queries"))
  }

  override def oracleSql: Map[String, String] = Map.empty
}
