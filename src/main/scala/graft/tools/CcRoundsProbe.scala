package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure-first probe for the connectedComponents round count (guide
  * §1): runs every board query that consumes min-label propagation at
  * the given SF with the Dedup logger at DEBUG, so the per-call
  * "converged after N rounds" lines land on stderr. The pointer-jump
  * (label(label(v))) variant only pays when rounds ≫ 3 — this probe is
  * the evidence for keeping or changing the loop. */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.text.Dedup$", org.apache.logging.log4j.Level.DEBUG)
    val consumers = Seq("q_near_dup_clusters", "q_dedup_canonical",
      "q_mutual_knn_clusters", "q_mutual_knn_clusters_lsh",
      "q_ingest_composed")
    consumers.foreach { n =>
      println(s"CCPROBE $n")
      graft.SparkEntry.queries(n)(spark, dir).count()
    }
    spark.stop()
  }
}
