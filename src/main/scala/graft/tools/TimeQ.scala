package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_mmr_rerank").split(",")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      (1 to 2).foreach { a =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        println(f"TIMEQ $n attempt$a ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    // memoized-build attribution (first attempts only — memos build once)
    import scala.jdk.CollectionConverters._
    graft.queries.QueryPack.buildSeconds.asScala.toSeq.sortBy(-_._2)
      .foreach { case (tag, sec) => println(f"TIMEQ memo $tag $sec%.2f s") }
  }
}
