package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame pipeline over the testdata tables; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against (queries without
  * an oracle get a weaker rows-only check). Query packs live under
  * [[graft.queries]].
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    VectorQueries,
    StatsQueries,
    RelationalQueries,
    LshQueries,
    TextQueries,
    EventQueries,
    SimilarityQueries,
    GraphQueries,
    CompressedQueries,
    MultimodalQueries,
    PipelineQueries,
    RetrievalQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * exact top-10 L2 nearest neighbors for 100 query vectors. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.exactNn(spark, "/root/testdata/sf0.001", graft.ann.ExactNN.L2)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size,
      "duplicate query keys across packs: " +
        all.groupBy(_._1).collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
