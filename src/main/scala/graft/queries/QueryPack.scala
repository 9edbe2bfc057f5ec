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

object QueryPack {
  /** Root for the dump-and-check side channels (seeded index builds and
    * searches dump parquet here so DuckDB can cross-check them in SQL).
    * Configurable via `-Dgraft.dump.root` so two concurrent sessions
    * can't clobber each other's dumps; a `def` so the property is read
    * when the query (and its generated oracle SQL) runs, not at class
    * init. Verify dumps `oracle_sql.json` in the same JVM that ran the
    * queries, so both sides of the compare see the same root. */
  def dumpRoot: String = sys.props.getOrElse("graft.dump.root", "/tmp")
}
