package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.pq.{Opq, Pq, PqConfig}
import graft.eval.Eval

/** OPQ-vs-PQ probe at the Fashion-MNIST baseline shape (60k x 784-d,
  * BASELINE.md rows 1-6), built with ScaleProbe's tiling recipe — which
  * is exactly the regime OPQ exists for: tiled dims are strongly
  * correlated across tiles, so plain PQ's blind d/m split stores the
  * same information m times over while the rotation can decorrelate.
  *
  * Usage: runMain graft.tools.OpqProbe [replicas=30] [dims=784] [m=16]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 30
    val dims = if (args.length > 1) args(1).toInt else 784
    val m = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val tiles = (dims + 63) / 64
    val base = base0.select(col("vec_id"),
      slice(flatten(transform(sequence(lit(0), lit(tiles - 1)), t =>
        transform(col("embedding"), (x, i) =>
          x + (pmod(xxhash64(t, col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 5000.0))), 1, dims).as("embedding"))
    val baseN = base.count()
    val corpus = spark.range(replicas).crossJoin(base)
      .select((col("id") * baseN + col("vec_id")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 50000.0).as("embedding"))
      .persist()
    val n = corpus.count()
    val queries = corpus.where(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val gt = ExactNN.topK(queries, corpus, 10).persist()
    gt.count()

    // subDim must divide dims; sampleCap bounds the driver-side fit
    val cfg = PqConfig(numSubvectors = m, codesPerSubvector = 16,
      seed = 42L, sampleCap = 10000)

    val (pqIdx, tPqFit) = time {
      val idx = Pq.train(corpus, "vec_id", "embedding", cfg)
      idx.codes.persist().count(); idx
    }
    val (pqRecall, tPqSearch) = time {
      Eval.setPrecisionRecall(pqIdx.searchAll(queries, 10), gt)
        .agg(avg("recall")).head().getDouble(0)
    }

    val (opqIdx, tOpqFit) = time {
      val idx = Opq.train(corpus, "vec_id", "embedding", cfg)
      idx.codes.persist().count(); idx
    }
    val (opqRecall, tOpqSearch) = time {
      Eval.setPrecisionRecall(opqIdx.searchAll(queries, 10), gt)
        .agg(avg("recall")).head().getDouble(0)
    }

    // rerank composes identically on both; measure at depth 100
    val (pqRerank, _) = time {
      Eval.setPrecisionRecall(
        pqIdx.searchRerank(queries, corpus, 10, 100), gt)
        .agg(avg("recall")).head().getDouble(0)
    }
    val (opqRerank, _) = time {
      Eval.setPrecisionRecall(
        opqIdx.searchRerank(queries, corpus, 10, 100), gt)
        .agg(avg("recall")).head().getDouble(0)
    }

    println(f"""OPQPROBE {"n":"$n","dims":$dims,"m":$m,""" +
      f""""pq_fit_s":$tPqFit%.1f,"opq_fit_s":$tOpqFit%.1f,""" +
      f""""pq_adc_recall":$pqRecall%.3f,"opq_adc_recall":$opqRecall%.3f,""" +
      f""""pq_rerank100_recall":$pqRerank%.3f,"opq_rerank100_recall":$opqRerank%.3f,""" +
      f""""pq_search_s":$tPqSearch%.1f,"opq_search_s":$tOpqSearch%.1f}""")

    // IVF-OPQ vs IVF-PQ at the same coarse geometry + code budget
    // (SPARK_GRAFT_IVFOPQ=1): does the rotation help the RESIDUAL
    // quantizer, ADC-only and under depth-100 rerank?
    if (sys.env.get("SPARK_GRAFT_IVFOPQ").contains("1")) {
      val nCells = math.max(4, math.sqrt(n.toDouble).toInt / 4)
      val icfg = graft.ann.ivfpq.IvfPqConfig(nCells = nCells,
        nProbe = math.max(2, nCells / 8), numSubvectors = m,
        codesPerSubvector = 16, seed = 42L, sampleCap = 10000)
      val (ipq, tIpqFit) = time {
        val x = graft.ann.ivfpq.IvfPq.train(corpus, "vec_id", "embedding", icfg)
        x.codes.persist().count(); x
      }
      val (iopq, tIopqFit) = time {
        val x = graft.ann.ivfpq.IvfOpq.train(corpus, "vec_id", "embedding", icfg)
        x.codes.persist().count(); x
      }
      def recallOf(pred: org.apache.spark.sql.DataFrame): Double =
        Eval.setPrecisionRecall(pred, gt).agg(avg("recall")).head().getDouble(0)
      val a1 = recallOf(ipq.searchAll(queries, 10))
      val a2 = recallOf(iopq.searchAll(queries, 10))
      val r1 = recallOf(ipq.searchRerank(queries, corpus, 10, 100))
      val r2 = recallOf(iopq.searchRerank(queries, corpus, 10, 100))
      println(f"""OPQPROBE_IVF {"nCells":$nCells,"nProbe":${icfg.nProbe},""" +
        f""""ivfpq_fit_s":$tIpqFit%.1f,"ivfopq_fit_s":$tIopqFit%.1f,""" +
        f""""ivfpq_adc_recall":$a1%.3f,"ivfopq_adc_recall":$a2%.3f,""" +
        f""""ivfpq_rerank100":$r1%.3f,"ivfopq_rerank100":$r2%.3f}""")
    }
    spark.stop()
  }
}
