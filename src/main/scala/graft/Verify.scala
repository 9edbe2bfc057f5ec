package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries run concurrently on the shared scheduler (4 at a time):
    // most of the suite is small jobs whose wall time is dominated by
    // stage latency, not cores — overlapping them roughly halves the
    // driver's correctness-gate round time.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // Local-iteration filter (comma-separated query names). The driver
    // never sets it; oracle_sql.json below always carries the full map,
    // so a filtered run against oracle_check reports the skipped
    // queries as missing rather than silently passing.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val tasks = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val df = fn(spark, sfDir)
            df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
            // Release THIS query's result caches (materializeRelease
            // keeps each pair result persisted until its consumer is
            // done). Queries run 4-way concurrent here, so a global
            // clearCache per query could evict another in-flight
            // query's persisted intermediates mid-use — instead,
            // uncache exactly the cached subtrees of this query's own
            // plan (df.unpersist() alone would miss them: the cache
            // sits BELOW the query's final select/orderBy). Caches
            // no longer accumulate across the 61-query run. Two queries
            // sharing one cached plan at most recompute it once.
            org.apache.spark.sql.graftshim.SparkShim
              .uncachePlanCaches(spark, df.queryExecution.analyzed)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            // drop any stale output from a previous run so a failure
            // can't masquerade as a pass in the compare step
            val dir = Paths.get(s"$outDir/$name")
            if (Files.exists(dir)) {
              Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.deleteIfExists(p))
            }
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // Backstop: anything a query persisted under its returned frame
    // (rather than the frame itself) is released here at exit.
    spark.sharedState.cacheManager.clearCache()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
