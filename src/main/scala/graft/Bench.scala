package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer reader, shuffle machinery)
    // so the first measured query doesn't absorb one-time JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Sorted by name so per-query times are comparable across rounds
    // (HashMap iteration reorders whenever a key is added, and each
    // query's time absorbs the JIT/page-cache state its predecessors
    // left behind). Caches are cleared between queries for the same
    // reason: a query must not be timed against another query's
    // persisted intermediates.
    //
    // Each query runs TWICE and reports the MIN: a single pass is at
    // the mercy of whatever else the host is doing — one contention
    // window in a shared sandbox once turned a 1 s query into an 18 s
    // phantom regression. Min-of-2 measures the plan, not the
    // neighbor's noise; back-to-back runs should agree within ~1.5x.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
