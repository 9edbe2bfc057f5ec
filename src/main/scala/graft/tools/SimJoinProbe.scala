package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.lsh.{Lsh, LshConfig}

/** Cross-set similarity-join scale probe: A indexed, B probing, at
  * n/2 + n/2 split of the clustered corpus (10-pt clusters — every
  * cluster contributes cross-parity near-dup pairs). Measures train,
  * join wall time, pair count, and recall vs a sampled exact GT.
  *
  * Usage: runMain graft.tools.SimJoinProbe [n]
  */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val corpus = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(floor(col("id") / 10), i), lit(2000))
            .cast("double") - 1000.0) / 250.0
            + (pmod(xxhash64(col("id"), i), lit(2000))
              .cast("double") - 1000.0) / 5000.0).as("embedding"))
      .persist()
    corpus.count()
    val a = corpus.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = corpus.where(pmod(col("vec_id"), lit(2)) === 1)
    // same-cluster cross-parity dists ~ noise scale; threshold between
    // the intra-cluster band and the background
    val threshold = 1.5

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (idx, tTrain) = time {
      val i = Lsh.train(a, "vec_id", "embedding",
        LshConfig(nTrees = sys.env.getOrElse("SPARK_GRAFT_SJ_TREES", "10").toInt, kMinVecs = sys.env.getOrElse("SPARK_GRAFT_SJ_KMIN", "40").toInt, seed = 42L,
          // full-set fit by default: a sample-capped fit inflates TRUE
          // occupancy by total/cap (the Lsh.fit warning), and for a JOIN
          // the candidate volume rides occupancy^2 per bucket — the 5x
          // inflation measured as a >79 GB distinct-shuffle spill at 1M
          sampleCap = sys.env.getOrElse("SPARK_GRAFT_SJ_SAMPLECAP", "500000").toInt))
      i.buckets.persist().count()
      i.vectors.persist().count()
      i
    }
    val (pairs, tJoin) = time {
      val p = idx.similarityJoin(b, "vec_id", "embedding", threshold,
        ExactNN.L2, maxBucketOccupancy = sys.env.getOrElse("SPARK_GRAFT_SJ_OCC", "200").toInt).persist()
      (p, p.count())
    }
    println(f"### n=$n train ${tTrain}%.1f s; sim join ${tJoin}%.1f s, " +
      s"${pairs._2} pairs")

    // sampled exact GT: cross-parity pairs of 2000 sampled A rows
    val sampleA = a.orderBy(xxhash64(col("vec_id"))).limit(2000)
      .select(col("vec_id").as("sa"), col("embedding").as("ea"))
      .persist()
    sampleA.count()
    val gt = sampleA.crossJoin(b.select(col("vec_id").as("sb"),
        col("embedding").as("eb")))
      .select(col("sa"), col("sb"),
        round(graft.functions.exprs.l2DistNative(col("ea"), col("eb")), 6)
          .as("d"))
      .where(col("d") <= threshold)
    val (nGt, tGt) = time(gt.persist().count())
    val found = pairs._1.select(col("vec_a").as("sa"), col("vec_b").as("sb"))
    val banded = gt
      .join(found, Seq("sa", "sb"), "left_semi").groupBy()
      .agg(count(lit(1)).as("hits"),
        sum(when(col("d") <= 1.35, 1L).otherwise(0L)).as("hits_close"))
      .crossJoin(gt.groupBy()
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") <= 1.35, 1L).otherwise(0L)).as("n_close")))
      .head()
    val (hits, hc, nAll, nc) = (banded.getLong(0), banded.getLong(1),
      banded.getLong(2), banded.getLong(3))
    println(f"### sampled GT $nAll pairs (exact ${tGt}%.1f s for 2000xB); " +
      f"recall ${hits.toDouble / math.max(1L, nAll)}%.4f; " +
      f"close-band (d<=1.35) ${hc.toDouble / math.max(1L, nc)}%.4f " +
      f"($nc pairs); edge-band ${(hits - hc).toDouble /
        math.max(1L, nAll - nc)}%.4f (${nAll - nc} pairs)")
    spark.stop()
  }
}
