package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timer: run a single SparkEntry query N times in isolation
  * (same session shape as Bench) to separate in-board pressure from a
  * real plan regression. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.OneQuery q_pq_recall 2"
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ONEQUERY $name rep=$i rows=$n sec=$sec%.3f")
    }
    spark.stop()
  }
}
