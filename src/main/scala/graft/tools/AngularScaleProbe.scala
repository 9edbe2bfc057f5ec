package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.lsh.{Lsh, LshConfig}
import graft.eval.Eval

/** Angular-regime scale probe — the NYTimes-shaped measurement the
  * reference publishes as its acknowledged weak axis (256-d cosine,
  * 290k vectors: LSH recall 0.868 at 268 ms/query vs exact 1053 ms,
  * reference README.md:169-172, configs annbench_test.go:235-245).
  *
  * Corpus: the sf0.1 embeddings table (2,000 x 64-d) tiled 4x along the
  * feature axis (per-tile deterministic jitter, so tiles are not exact
  * copies) to 256-d, then replicated row-wise with jitter to the target
  * row count — same derive-from-testdata recipe as [[ScaleProbe]].
  *
  * Usage: runMain graft.tools.AngularScaleProbe [nQueries=500] [replica...]
  */
object AngularScaleProbe {
  def main(args: Array[String]): Unit = {
    val nQueries = if (args.nonEmpty) args.head.toInt else 500
    val replicas = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(145)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()
    // 64-d -> 256-d: concat 4 jittered tiles of the source embedding
    val wide = base.select(col("vec_id"),
      flatten(transform(sequence(lit(0), lit(3)), t =>
        transform(col("embedding"), (x, i) =>
          x + (pmod(xxhash64(t, col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 5000.0))).as("embedding"))

    val threshold = 0.85 // accept radius sized to this corpus's cosine spread

    for (k <- replicas) {
      val corpus = spark.range(k).crossJoin(wide)
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

      // SPARK_GRAFT_SKIP_EXACT=1 drops the two timed exact passes (same
      // rationale as ScaleProbe: they never change between config sweeps
      // over the same corpus); ground truth below stays exact.
      val skipExact = sys.env.get("SPARK_GRAFT_SKIP_EXACT").contains("1")
      val (tExact0, tExact) =
        if (skipExact) (Double.NaN, Double.NaN)
        else {
          val (_, a) = time(
            ExactNN.topK(queries, corpus, 10, ExactNN.Cosine).count())
          val (_, b) = time(
            ExactNN.topK(queries, corpus, 10, ExactNN.Cosine).count())
          (a, b)
        }
      val gt = ExactNN.topK(queries, corpus, 10, ExactNN.Cosine,
        threshold = Some(threshold)).persist()
      gt.count()

      // sampleCap matters once the corpus outgrows the default 100k fit
      // sample: bucket occupancy ~ (corpus/sample) x kMinVecs, so at
      // 1M+ corpora raise it (SPARK_GRAFT_SAMPLE_CAP) to keep buckets at
      // their design size.
      val sampleCap = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_CAP", "100000").toInt
      // blank SPARK_GRAFT_PROBE_CONFIGS skips the LSH block entirely
      // (e.g. an IVF-PQ-only probe run)
      val configs = sys.env.get("SPARK_GRAFT_PROBE_CONFIGS") match {
        case Some(s) => s.split(";").toSeq.filter(_.trim.nonEmpty).map { c =>
          val Array(t, k) = c.split(","); (t.toInt, k.toInt)
        }
        case None => Seq((20, 80), (40, 120))
      }
      // speedup/exact read "n/a" (not NaN) when the timed exact passes
      // are skipped — NaN would trip downstream log parsing
      def ratio(denom: Double): String =
        if (skipExact) "n/a" else f"${tExact / denom}%.1fx"
      val exactStr =
        if (skipExact) "n/a" else f"${tExact}%.2fs (warm ${tExact0}%.2f)"
      for ((nTrees, kMin) <- configs) {
        val (idx, tTrain) = time {
          val i = Lsh.train(corpus, "vec_id", "embedding",
            LshConfig(nTrees = nTrees, kMinVecs = kMin, angular = true, seed = 42L,
              sampleCap = sampleCap))
          i.buckets.persist().count()
          i.vectors.persist().count()
          i
        }
        val (_, tLsh0) = time(
          idx.searchAll(queries, 10, threshold, ExactNN.Cosine).count())
        val (_, tLsh) = time(
          idx.searchAll(queries, 10, threshold, ExactNN.Cosine).count())
        val recall = Eval.setPrecisionRecall(
            idx.searchAll(queries, 10, threshold, ExactNN.Cosine), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[angular] corpus=$n%,d dims=256 nTrees=$nTrees kMin=$kMin " +
          f"exact=$exactStr train=${tTrain}%.2fs " +
          f"lsh=${tLsh}%.2fs (warm ${tLsh0}%.2f) " +
          f"speedup=${ratio(tLsh)} recall=$recall%.3f")
        idx.buckets.unpersist(); idx.vectors.unpersist()
      }
      // Angular IVF-PQ (opt-in: SPARK_GRAFT_IVFPQ=1) — the compressed
      // index on the unit sphere: residual codes over cosine cells,
      // exact-cosine rerank (same knobs as ScaleProbe's L2 block).
      if (sys.env.get("SPARK_GRAFT_IVFPQ").contains("1")) {
        val nCells = math.min(1024, math.max(16, math.sqrt(n.toDouble).toInt))
        val nProbe = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_PROBES",
          math.max(4, nCells / 8).toString).toInt
        val depth = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_DEPTH", "500").toInt
        val ipCfg = graft.ann.ivfpq.IvfPqConfig(
          nCells = nCells, nProbe = nProbe,
          numSubvectors = 16, codesPerSubvector = 256, iters = 5,
          seed = 42L, sampleCap = sampleCap, angular = true)
        val (ip, tIpTrain) = time {
          val i = graft.ann.ivfpq.IvfPq.train(corpus, "vec_id", "embedding", ipCfg)
          i.codes.persist().count()
          i
        }
        val vecs = corpus.select(col("vec_id"), col("embedding"))
        val (_, tIp0) = time(ip.searchRerank(queries, vecs, 10, depth).count())
        val (_, tIp) = time(ip.searchRerank(queries, vecs, 10, depth).count())
        val ipRecall = Eval.setPrecisionRecall(
          ip.searchRerank(queries, vecs, 10, depth), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[angular] corpus=$n%,d dims=256 ivfpq(nCells=$nCells, " +
          f"nProbe=$nProbe, m=16, k=256, depth=$depth): " +
          f"train=${tIpTrain}%.2fs rerank_search=${tIp}%.2fs (warm ${tIp0}%.2f) " +
          f"recall=$ipRecall%.3f")
        ip.codes.unpersist()
      }

      corpus.unpersist(); gt.unpersist()
    }
    spark.stop()
  }
}
