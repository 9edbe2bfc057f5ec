package graft.ann.ivfpq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.pq.{Opq, Pq}

/** OPQ pre-transform in front of IVF-PQ — the faiss-style
  * "OPQ_m, IVF_c, PQ_m" production composition: a globally learned
  * orthogonal rotation ([[graft.ann.pq.Opq.fit]], same multi-start
  * alternation and never-worse-than-PQ construction) decorrelates the
  * space, then the ROTATED corpus trains and serves the standard
  * IVF-PQ residual index. Everything downstream of the rotation is
  * [[IvfPqIndex]] verbatim — coarse cells, residual ADC, scan-side
  * `codesFilter`, the cell-partitioned at-rest layout, the lifecycle
  * contract — so the rotation composes with the whole 100 TB story at
  * the cost of one map-side matrix-vector product per row (build) and
  * per query (serve).
  *
  * Exact rerank runs on the ORIGINAL float vectors with the ORIGINAL
  * queries: the rotation is L2-isometric (and norm-preserving, so the
  * angular pairing is unchanged too) — only candidate GENERATION sees
  * the rotated space.
  */
object IvfOpq {

  /** Fit rotation on the sampled corpus, then train IVF-PQ on the
    * rotated vectors. The rotation is fit against the flat-PQ code
    * budget (`config.pqConfig`) — the standard pre-transform recipe:
    * the residual sub-codebooks are then re-learned inside the rotated
    * space by the IVF-PQ fit itself. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            config: IvfPqConfig = IvfPqConfig(),
            opqIters: Int = 8, numInits: Int = 3): IvfOpqIndex = {
    val rot = Opq.fit(df, vecCol, config.pqConfig, opqIters, numInits).rotation
    val rotated = df.select(col(idCol),
      Opq.rotateCol(rot, col(vecCol)).as(vecCol))
    new IvfOpqIndex(rot, IvfPq.train(rotated, idCol, vecCol, config))
  }

  /** Reopen: [[IvfPq.load]]'s layout plus the rotation table. */
  def load(spark: SparkSession, path: String): IvfOpqIndex = {
    val innerIdx = IvfPq.load(spark, path)
    new IvfOpqIndex(
      Opq.loadRotation(spark, path, innerIdx.model.pq.dims), innerIdx)
  }
}

/** Serving wrapper: identical contract to [[IvfPqIndex]] with queries
  * rotated map-side on the way in and exact rerank on original
  * vectors (isometry). */
final class IvfOpqIndex(val rotation: Opq.RotationMatrix,
                        val inner: IvfPqIndex) {

  def codes: DataFrame = inner.codes
  def cellStats: DataFrame = inner.cellStats

  private def rotated(queries: DataFrame): DataFrame =
    queries.select(col("query_id"),
      Opq.rotateCol(rotation, col("qv")).as("qv"))

  /** Residual-ADC search in the rotated space (distances are the same
    * metric by isometry). */
  def searchAll(queries: DataFrame, k: Int, roundTo: Int = 6,
                codesFilter: Option[Column] = None): DataFrame =
    inner.searchAll(rotated(queries), k, roundTo, codesFilter)

  /** ADC candidates from rotated codes; exact rerank on ORIGINAL
    * vectors and queries (the shared [[Pq.exactRerankTail]], cosine in
    * angular mode — rotation preserves norms, so the pairing holds). */
  def searchRerank(queries: DataFrame, vectors: DataFrame, k: Int,
                   rerankDepth: Int = 100, roundTo: Int = 6,
                   codesFilter: Option[Column] = None): DataFrame = {
    val cands = searchAll(queries, rerankDepth, roundTo, codesFilter)
      .select("query_id", "vec_id")
    Pq.exactRerankTail(cands, queries, vectors, k, roundTo,
      angular = inner.model.config.angular)
  }

  /** Lifecycle: arrivals/updates rotate map-side, then the frozen
    * IVF-PQ quantizers encode — the uniform six-family contract with
    * the rotation as a third frozen stage. */
  def withDeletes(tombstones: DataFrame): IvfOpqIndex =
    new IvfOpqIndex(rotation, inner.withDeletes(tombstones))

  def append(arrivals: DataFrame): IvfOpqIndex =
    new IvfOpqIndex(rotation, inner.append(
      arrivals.select(col("vec_id"),
        Opq.rotateCol(rotation, col("embedding")).as("embedding"))))

  def upsert(updates: DataFrame): IvfOpqIndex =
    withDeletes(updates.select("vec_id")).append(updates)

  def save(spark: SparkSession, path: String): Unit = {
    inner.save(spark, path)
    Opq.saveRotation(spark, path, rotation)
  }
}
