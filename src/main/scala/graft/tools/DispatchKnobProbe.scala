package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.FilteredSearch
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}

/** The dispatch estimator's OWN knobs, swept at 1M (round 17 — the
  * round-16 verdict's "unswept knobs" item): `DefaultLocalBeamWidth =
  * 32` was inherited from the graph walk's beamWidth and the LSH
  * estimator reads tree 0 by fixed choice; neither had a measured
  * curve. This probe re-runs the round-16 2×2 (correlation ×
  * selectivity) arms and reports, per (family, arm, treeId, beamWidth):
  * the median / 25th-percentile local-allowed estimate, the route
  * [[FilteredSearch.routeBucket]] takes, and the estimator's wall cost
  * — so the default is either re-pinned off the curve or its
  * insensitivity is documented as the negative result.
  *
  * Usage: runMain graft.tools.DispatchKnobProbe [nQueries=200] [replicas=100]
  */
object DispatchKnobProbe {
  def main(args: Array[String]): Unit = {
    val nQueries = if (args.nonEmpty) args.head.toInt else 200
    val replicas = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()
    val corpus = spark.range(replicas).crossJoin(base)
      .select(
        (col("id") * baseN + col("vec_id")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 50000.0).as("embedding"))
      .persist()
    val n = corpus.count()
    val k = 10

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val queries = corpus.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()
    val arms = Seq(
      ("corr10", pmod(col("vec_id"), lit(10)) === 3),
      ("uncorr10", pmod(xxhash64(col("vec_id")), lit(10)) === 3),
      ("corr50", pmod(col("vec_id"), lit(2)) === 0),
      ("uncorr50", pmod(xxhash64(col("vec_id")), lit(2)) === 0))

    val idx = Lsh.train(corpus, "vec_id", "embedding",
      LshConfig(nTrees = 20, kMinVecs = 80, seed = 42L, sampleCap = 100000))
    idx.buckets.persist().count(); idx.vectors.persist().count()

    def decideFrom(la: org.apache.spark.sql.DataFrame, nA: Long)
        : (Double, Double, String) = {
      val row = la.agg(expr("percentile(local_allowed, 0.5)"),
        expr("percentile(local_allowed, 0.25)")).head()
      val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      val q25 = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      (med, q25, FilteredSearch.routeBucket(nA, n, med, k).name)
    }

    for ((tag, pred) <- arms) {
      val allowed = corpus.where(pred).select("vec_id").localCheckpoint()
      val nA = allowed.count()
      for (treeId <- Seq(0, 7, 19); beam <- Seq(8, 16, 32, 64)) {
        val ((med, q25, route), t) = time(decideFrom(
          idx.localAllowedCounts(queries, allowed, beam, treeId = treeId),
          nA))
        println(f"[kprobe] lsh:$tag%-9s tree=$treeId%2d beam=$beam%3d " +
          f"median=$med%6.1f q25=$q25%6.1f route=$route%-17s est=$t%.1fs")
      }
      allowed.unpersist()
    }
    idx.buckets.unpersist(); idx.vectors.unpersist()

    val ivf = Ivf.train(corpus, "vec_id", "embedding",
      IvfConfig(nCells = 1024, nProbe = 32, seed = 42L, sampleCap = 100000))
    ivf.cells.persist().count(); ivf.vectors.persist().count()
    for ((tag, pred) <- arms) {
      val allowed = corpus.where(pred).select("vec_id").localCheckpoint()
      val nA = allowed.count()
      for (beam <- Seq(8, 16, 32, 64)) {
        val ((med, q25, route), t) = time(decideFrom(
          ivf.localAllowedCounts(queries, allowed, beam), nA))
        println(f"[kprobe] ivf:$tag%-9s beam=$beam%3d " +
          f"median=$med%6.1f q25=$q25%6.1f route=$route%-17s est=$t%.1fs")
      }
      allowed.unpersist()
    }
    spark.stop()
  }
}
