package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-17 measurement harness (guide §1: measure first): per-query
  * wall seconds (cold + warm attempts, the bench's min-of-2 protocol),
  * Spark JOB and STAGE counts per attempt — the dominant cost at the
  * bench's tiny-per-query scale is scheduled-job latency, so the job
  * count is the observable the optimization targets — and the final
  * frame's `explain("formatted")` written to plans/r17/<q>_<tag>.txt.
  *
  * Env: SPARK_GRAFT_ONLY (comma query names), SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, GRAFT_PLAN_TAG (suffix for the plan files;
  * default "before"), GRAFT_PLAN_DIR (default plans/r17). */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_lsh_search_l2")
      .split(",").toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("GRAFT_PLAN_TAG", "before")
    val planDir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r17")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    names.foreach { n =>
      var plan: String = null
      (1 to 2).foreach { a =>
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $n attempt$a $dt%.2f s jobs=${jobs.get} " +
          f"stages=${stages.get}")
        if (a == 2) plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        spark.sharedState.cacheManager.clearCache()
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$planDir/${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
    }
    import scala.jdk.CollectionConverters._
    graft.queries.QueryPack.buildSeconds.asScala.toSeq.sortBy(-_._2)
      .foreach { case (t, sec) => println(f"PROFILE memo $t $sec%.2f s") }
    spark.stop()
  }
}
