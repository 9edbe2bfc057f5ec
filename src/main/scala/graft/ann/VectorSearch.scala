package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ann.lsh.{Lsh, LshConfig, LshIndex}

/** Reference-API facade — the drop-in surface for a user of
  * gasparian/vector-search-go (`Indexer` interface, lsh/lsh.go:54-57 and
  * README.md:37-40):
  *
  *   - `Train(vecs, ids)`       -> [[train]] over an (id, vector) DataFrame
  *   - `Search(q, maxNN, thr)`  -> [[search]] (single query, driver-side
  *                                 result) or [[searchAll]] (the batch
  *                                 form that is the real Spark surface)
  *   - `DumpHasher`/`LoadHasher` -> [[save]] / [[VectorSearch.load]]
  *
  * The single-query `search` is a convenience wrapper: it runs the same
  * distributed plan over a one-row query DataFrame. Online serving of
  * single queries belongs in a specialized runtime; on Spark the batch
  * form is the first-class citizen (SURVEY.md §3.2).
  */
final class VectorSearch private (val spark: SparkSession,
                                  val config: LshConfig,
                                  private var idx: Option[LshIndex]) {

  def this(spark: SparkSession, config: LshConfig = LshConfig()) =
    this(spark, config, None)

  private def metric: ExactNN.Metric =
    if (config.angular) ExactNN.Cosine else ExactNN.L2

  def index: LshIndex =
    idx.getOrElse(throw new IllegalStateException("call train() or load() first"))

  /** Reference `Train`: (re)build the index over (id, vector) rows —
    * any previous index is discarded (Store.Clear semantics, lsh.go:107). */
  def train(df: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): this.type = {
    idx = Some(Lsh.train(df, idCol, vecCol, config))
    this
  }

  /** Reference `Search`: top-`maxNN` neighbors of one query vector within
    * `distanceThreshold`, ascending distance (ties pinned by id). */
  def search(query: Array[Double], maxNN: Int,
             distanceThreshold: Double): Seq[TopK.Neighbor] = {
    import spark.implicits._
    val q = Seq((0L, query.toSeq)).toDF("query_id", "qv")
    index.searchAll(q, maxNN, distanceThreshold, metric)
      .orderBy("dist", "vec_id")
      .collect()
      .map(r => TopK.Neighbor(r.getLong(1), r.getDouble(2)))
      .toSeq
  }

  /** Batch search: (query_id, qv) DataFrame in, (query_id, vec_id, dist)
    * out — k rows per query. */
  def searchAll(queries: DataFrame, maxNN: Int,
                distanceThreshold: Double): DataFrame =
    index.searchAll(queries, maxNN, distanceThreshold, metric)

  /** Reference `DumpHasher` + store persistence. */
  def save(path: String): Unit = index.save(spark, path)
}

object VectorSearch {

  /** Reference `LoadHasher`: reopen a saved index. */
  def load(spark: SparkSession, path: String): VectorSearch = {
    val idx = Lsh.load(spark, path)
    new VectorSearch(spark, idx.model.config, Some(idx))
  }
}
