package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** Scale probe: replicates the sf0.1 embeddings corpus K-fold with
  * deterministic jitter, then measures exact-NN vs LSH search wall time
  * and recall at growing corpus sizes — the local stand-in for the
  * reference's ann-benchmarks runs (BASELINE.md: 30-70x speedup at
  * ~0.94-0.95 recall on 60k-1M vectors).
  *
  * Usage: runMain graft.tools.ScaleProbe [replicas...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // usage: ScaleProbe [nQueries=500] [replica...]
    val nQueries = if (args.nonEmpty) args.head.toInt else 500
    val replicas = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()

    for (k <- replicas) {
      // replica r shifts ids by r*baseN and jitters each component by a
      // small deterministic hash-derived offset so copies aren't identical
      val corpus = spark.range(k).crossJoin(base)
        .select(
          (col("id") * baseN + col("vec_id")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i), lit(1000))
              .cast("double") - 500.0) / 50000.0).as("embedding"))
        .persist()
      val n = corpus.count()
      val queries = corpus.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }

      val (_, tExact0) = time(ExactNN.topK(queries, corpus, 10).count())
      val (_, tExact) = time(ExactNN.topK(queries, corpus, 10).count())
      // ground truth computed once and cached for both index recalls
      val gt = ExactNN.topK(queries, corpus, 10, ExactNN.L2, threshold = Some(1.4))
        .persist()
      gt.count()

      val (idx, tTrain) = time {
        val i = Lsh.train(corpus, "vec_id", "embedding",
          LshConfig(nTrees = 20, kMinVecs = 80, seed = 42L))
        i.buckets.persist().count()
        i.vectors.persist().count()
        i
      }
      val (_, tLsh0) = time(idx.searchAll(queries, 10, 1.4).count())
      val (_, tLsh) = time(idx.searchAll(queries, 10, 1.4).count())
      val recall = Eval.setPrecisionRecall(idx.searchAll(queries, 10, 1.4), gt)
        .agg(avg("recall")).head().getDouble(0)

      println(f"[scale] corpus=$n%,d exact=${tExact}%.2fs (warm ${tExact0}%.2f) " +
        f"train=${tTrain}%.2fs lsh=${tLsh}%.2fs (warm ${tLsh0}%.2f) " +
        f"speedup=${tExact / tLsh}%.1fx recall=$recall%.3f")

      val nCells = math.max(16, math.sqrt(n.toDouble).toInt)
      val (ivf, tIvfTrain) = time {
        val i = Ivf.train(corpus, "vec_id", "embedding",
          IvfConfig(nCells = nCells, nProbe = nCells / 4, seed = 42L))
        i.cells.persist().count()
        i.vectors.persist().count()
        i
      }
      val (_, tIvf0) = time(ivf.searchAll(queries, 10).count())
      val (_, tIvf) = time(ivf.searchAll(queries, 10).count())
      val ivfPred = ivf.searchAll(queries, 10)
        .join(gt.select("query_id", "vec_id"), Seq("query_id", "vec_id"), "left_semi")
      val ivfRecall = Eval.setPrecisionRecall(
        ivf.searchAll(queries, 10), gt).agg(avg("recall")).head().getDouble(0)
      println(f"[scale] corpus=$n%,d ivf(nCells=$nCells, nProbe=${nCells / 4}): " +
        f"train=${tIvfTrain}%.2fs search=${tIvf}%.2fs (warm ${tIvf0}%.2f) " +
        f"speedup=${tExact / tIvf}%.1fx recall=$ivfRecall%.3f")

      corpus.unpersist(); gt.unpersist()
      idx.buckets.unpersist(); idx.vectors.unpersist()
      ivf.cells.unpersist(); ivf.vectors.unpersist()
    }
    spark.stop()
  }
}
