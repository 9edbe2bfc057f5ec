package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md: exact-scan vs LSH-index-served
  * vector arm of the hybrid retriever at a given sf — per-arm latency
  * plus the fused-rank agreement between the two hybrids. */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.queries.{LshQueries, RetrievalQueries}
    // SPARK_GRAFT_REPLICAS > 1 replicates the corpus with deterministic
    // jitter (the ScaleProbe recipe) to measure where the exact arm's
    // per-query corpus scan diverges from the index arm's probe cost.
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "1").toInt
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val baseN = base.count()
    val e =
      if (replicas == 1) base
      else spark.range(replicas).crossJoin(base)
        .select((col("id") * baseN + col("vec_id")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i),
              lit(1000)).cast("double") - 500.0) / 50000.0).as("embedding"))
        .persist()
    val n = e.count()
    val nq = sys.env.getOrElse("SPARK_GRAFT_NQ",
      RetrievalQueries.NumHybridQueries.toString).toInt
    val q = e.where(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // exact arm: full-corpus cosine scan + bounded rank (ExactNN's
    // corpus-parallel broadcast-queries shape — the corpus scan is the
    // distributed side, the query set the broadcast side)
    def exactArm() =
      graft.ann.ExactNN.topKAgg(q, e, RetrievalQueries.FuseDepth,
        graft.ann.ExactNN.Cosine).count()
    (1 to 2).foreach { a =>
      val (_, t) = time(exactArm())
      println(f"HYB exact_arm n=$n attempt$a $t%.2f s")
    }

    // index arm: angular LSH train once, then probe+score
    val (idx, tTrain) = time(
      graft.ann.lsh.Lsh.train(e, "vec_id", "embedding",
        LshQueries.config(angular = true)))
    println(f"HYB lsh_train n=$n $tTrain%.2f s")
    def indexArm() =
      idx.searchAll(q, RetrievalQueries.FuseDepth + 1, 2.0,
          graft.ann.ExactNN.Cosine)
        .where(col("vec_id") =!= col("query_id"))
        .count()
    (1 to 2).foreach { a =>
      val (c, t) = time(indexArm())
      println(f"HYB index_arm n=$n attempt$a $t%.2f s rows=$c")
    }

    // fused agreement (the certification query, memo-backed) — only
    // meaningful against the real testdata, skip for replicated runs
    if (replicas == 1) {
      val agree = graft.SparkEntry.queries("q_hybrid_rrf_agreement")(spark, dir)
        .collect().head
      println(s"HYB fused_agreement $agree")
    }
    spark.stop()
  }
}
