package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{ExactNN, KnnGraph, NnDescent}
import graft.ann.lsh.{Lsh, LshConfig}

/** k-NN-graph scale probe: measures the LSH-graph + NN-Descent pipeline
  * (`q_knn_graph_lsh` / `q_knn_graph_nnd`) at corpus sizes far beyond
  * the sf tables, on a CLUSTERED corpus — the low-intrinsic-dimension
  * regime embedding corpora actually live in (and the regime NN-Descent
  * is for; NnDescentSpec shows the near-iid testdata stalls it).
  *
  * Corpus: n points in 64-d, 10 per cluster; cluster centers and
  * per-point noise are xxhash-derived (deterministic, no RNG). Ground
  * truth: exact top-k for a SAMPLE of nodes (exact GT for every node is
  * the quadratic the pipeline exists to avoid) via the broadcast-sample
  * ExactNN scan; graph recall for the LSH graph and each refinement
  * round is graded on the sampled nodes.
  *
  * Usage: runMain graft.tools.GraphScaleProbe [n ...]
  *   SPARK_GRAFT_GRAPH_SAMPLE  GT sample size (default 300)
  *   SPARK_GRAFT_GRAPH_K       neighbors per node (default 8)
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50000)
    val sample = sys.env.getOrElse("SPARK_GRAFT_GRAPH_SAMPLE", "300").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_GRAPH_K", "8").toInt
    // dense clustered buckets: occupancy² drives the pair join; 50
    // covers the 10-point clusters with a 5x margin at 16x less
    // fan-out than the near-dup default of 200
    val occupancy = sys.env.getOrElse("SPARK_GRAFT_GRAPH_OCC", "50").toInt
    val nTrees = sys.env.getOrElse("SPARK_GRAFT_GRAPH_TREES", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (n <- sizes) {
      // 10 points per cluster: center[i] ~ U[-4,4), point = center + noise
      val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            (pmod(xxhash64(floor(col("id") / 10), i), lit(2000))
              .cast("double") - 1000.0) / 250.0
              + (pmod(xxhash64(col("id"), i), lit(2000))
                .cast("double") - 1000.0) / 5000.0).as("embedding"))
        .persist()
      corpus.count()

      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }

      // sampled ground truth (deterministic sample: lowest hash)
      val probes = corpus
        .select(col("vec_id"), col("embedding"), xxhash64(col("vec_id")).as("h"))
        .orderBy("h").limit(sample)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .persist()
      val (gt, tGt) = timed {
        val g = ExactNN.topKAgg(probes, corpus, k + 1, ExactNN.Cosine)
          .where(col("vec_id") =!= col("query_id"))
        val w = graft.ann.TopK.perQueryTopK(g, k, viaAggregator = true)
          .select(col("query_id"), col("vec_id")).persist()
        w.count(); w
      }

      def recallOf(g: DataFrame): Double =
        graft.eval.Eval.setPrecisionRecall(
            g.join(probes.select(col("query_id").as("src")).hint("broadcast"), "src")
              .select(col("src").as("query_id"), col("dst").as("vec_id")),
            gt)
          .agg(avg("recall")).head().getDouble(0)

      val (idx, tTrain) = timed {
        Lsh.train(corpus, "vec_id", "embedding",
          LshConfig(nTrees = nTrees, kMinVecs = 80, angular = true, seed = 42L))
      }
      val (g0, tG0) = timed {
        val g = KnnGraph.fromLsh(idx, corpus, "vec_id", "embedding", k,
          ExactNN.Cosine, maxBucketOccupancy = occupancy).persist()
        g.count(); g
      }
      val r0 = recallOf(g0)
      var g = g0
      val rounds = (1 to 2).map { r =>
        val (gr, t) = timed {
          val x = NnDescent.refine(g, corpus, "vec_id", "embedding", k,
            ExactNN.Cosine, iterations = 1).persist()
          x.count(); x
        }
        g.unpersist(false)
        g = gr
        val rec = recallOf(gr)
        (t, rec)
      }
      // beam-search blocks share one backbone-augmented graph; both
      // measure under the SAME protocol as gt (k+1 then drop self —
      // probes are corpus members, gt excludes self)
      val withBackbone = g.select(col("src"), col("dst")).unionByName(
          graft.ann.GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst").persist()
      withBackbone.count()
      def dropSelf(raw: org.apache.spark.sql.DataFrame) =
        graft.ann.TopK.perQueryTopK(
          raw.where(col("vec_id") =!= col("query_id")), k,
          viaAggregator = true)
      // graph-index SEARCH half, global fixed entries
      val (beamRec, tBeam) = {
        val (res, t) = timed {
          val r = dropSelf(graft.ann.GraphSearch.beam(withBackbone, corpus,
            "vec_id", "embedding", probes, (0L until 32L).toSeq,
            k + 1, 32, 4)).persist()
          r.count(); r
        }
        val rec = graft.eval.Eval.setPrecisionRecall(
            res.select(col("query_id"), col("vec_id")), gt)
          .agg(avg("recall")).head().getDouble(0)
        res.unpersist()
        (rec, t)
      }
      // the scale form: LSH-seeded per-query entries (coarse index finds
      // the region, graph walk refines) — the DiskANN-style composition
      val (seedRec, tSeed) = {
        val entries = idx.searchAll(probes, 32, Double.MaxValue,
            graft.ann.ExactNN.Cosine)
          .select(col("query_id"), col("vec_id").as("node")).persist()
        val entRec = graft.eval.Eval.setPrecisionRecall(
            entries.select(col("query_id"), col("node").as("vec_id")), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"PROBE entry-set (LSH top-32) recall=$entRec%.4f")
        val (res, t) = timed {
          val r = dropSelf(graft.ann.GraphSearch.beamFrom(withBackbone,
            corpus, "vec_id", "embedding", probes, entries,
            k + 1, 32, 2)).persist()
          r.count(); r
        }
        val rec = graft.eval.Eval.setPrecisionRecall(
            res.select(col("query_id"), col("vec_id")), gt)
          .agg(avg("recall")).head().getDouble(0)
        res.unpersist(); entries.unpersist()
        (rec, t)
      }
      withBackbone.unpersist()
      val edges = g.count()
      println(f"PROBE beam-global: recall=$beamRec%.4f t=$tBeam%.1fs (${tBeam / sample * 1000}%.1f ms/query batched)")
      println(f"PROBE beam-lsh-seeded: recall=$seedRec%.4f t=$tSeed%.1fs (${tSeed / sample * 1000}%.1f ms/query batched)")
      println(f"PROBE n=$n%d k=$k%d trees=$nTrees%d occ=$occupancy%d train=$tTrain%.1fs lshGraph=$tG0%.1fs " +
        f"recall0=$r0%.4f " +
        rounds.zipWithIndex.map { case ((t, rec), i) =>
          f"round${i + 1}=$t%.1fs recall${i + 1}=$rec%.4f"
        }.mkString(" ") +
        f" edges=$edges%d gtSample=$sample%d gtTime=$tGt%.1fs")
      corpus.unpersist(); probes.unpersist(); gt.unpersist(); g.unpersist()
    }
  }
}
