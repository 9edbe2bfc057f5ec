package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "localhost")
    // Plan-shape specs (TextPlanSpec, DedupPlanSpec) count operator
    // occurrences in optimizedPlan.toString; the default
    // maxToStringFields=25 truncates wide projections to "... N more
    // fields", which would make those counts track the RENDERING, not
    // the plan. Pin it far above any projection width we emit.
    .config("spark.sql.debug.maxToStringFields", "1000")
    .getOrCreate()
}

trait SparkSpecBase {
  lazy val spark: SparkSession = SparkTestSession.spark
  def sf(dir: String): String = s"/root/testdata/$dir"
}
