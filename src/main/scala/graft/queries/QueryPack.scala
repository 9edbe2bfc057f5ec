package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries: each key appears in
  * `SparkEntry.queries`, and (when SQL-expressible) in
  * `SparkEntry.oracleSql` with the DuckDB-equivalent SQL. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  protected def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
