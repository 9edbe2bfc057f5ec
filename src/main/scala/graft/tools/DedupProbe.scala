package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Dedup
import graft.text.Dedup.MinHashConfig
import graft.text.TextFunctions._

/** Scratch: stage timings + plan shape for the minhash near-dup pipeline
  * (delete after use). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cfg = MinHashConfig(shingleN = 3, numHashes = 8, bandRows = 2,
      jaccardThreshold = 0.5, maxDocFreqRatio = 1.0)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // Reconstruct minhashNearDup's banded frame (pre-persist)
    val withSh = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= cfg.shingleN)
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), cfg.shingleN)).as("sh"))
    val banded = withSh
      .select(col("doc_id"), col("sh"),
        transform(col("sh"), s => hash60(0, s) % FpMod).as("hv"))
      .select(col("doc_id"), col("sh"),
        Dedup.minhashSigFromHashes(col("hv"), cfg).as("sig"))
      .select(col("doc_id"), col("sh"),
        explode(Dedup.bandKeysCol(col("sig"), cfg)).as("bk"))

    val plan = banded.queryExecution.optimizedPlan.toString
    val md5Count = "md5\\(".r.findAllIn(plan).length
    println(s"[probe] md5 occurrences in optimized plan: $md5Count")
    println(plan.take(4000))

    time("banded.count")(banded.count())
    time("banded.count again")(banded.count())
    // Compare: hash array computed once per row via exploded groupBy
    val exploded = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), (hash60(0, col("s")) % FpMod).as("h"))
    time("exploded hash count")(exploded.count())
    time("full minhashNearDup")(Dedup.minhashNearDup(docs, "doc_id", "text", cfg).count())
    spark.stop()
  }
}
