package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{ExactNN, GraphSearch, KnnGraph}
import graft.ann.lsh.{Lsh, LshConfig}

/** Constrained graph serving at scale — the SCALE.md §filtered ANN
  * treatment applied to [[graft.ann.GraphSearch.beamFrom]]'s `allowed`
  * pool: the gate-scale oracle rows certify correctness on ~6k rows;
  * this measures what a 100 TB user actually cares about — filtered
  * recall vs the exact ground truth over the predicate subset, and
  * latency, at 1M across selectivities, including the
  * [[graft.ann.GraphSearch.beamFromFiltered]] dispatch region (≤5%
  * allowed → exact scan, recall 1.0 by construction).
  *
  * Protocol: LSH-seeded per-query entries (the deployment shape), the
  * walk itself routes through DISALLOWED nodes, the per-hop pool keeps
  * beamWidth allowed candidates; GT is the exact top-k over the
  * allowed subset (both sides include the query's own row when the
  * predicate admits it — consistent, so recall is comparable to the
  * unfiltered beam rows).
  *
  * Usage: runMain graft.tools.GraphFilteredProbe [n] [queries]
  * (default: 1000000 500)
  */
object GraphFilteredProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toInt else 1000000
    val qn = if (args.length > 1) args(1).toInt else 500
    val k = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // label columns ride on the ONE persisted corpus frame — a second
    // persisted corpus copy (an earlier probe revision) evicted the
    // graph cache and the walk recomputed the LSH bucket join per hop
    val corpus = ProbeGen.clustered(spark, n)
      .withColumn("label10", col("vec_id") % 10)
      .withColumn("label50", pmod(col("vec_id"), lit(50)))
      .persist()
    corpus.count()
    val (graphAndIdx, tBuild) = ProbeGen.timed {
      val ix = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
      val g = KnnGraph.fromLsh(ix, corpus, "vec_id", "embedding", 8,
          ExactNN.Cosine, maxBucketOccupancy = 50)
        .select(col("src"), col("dst"))
        .unionByName(GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst")
        .persist()
      g.count()
      (g, ix)
    }
    val (g, idx) = graphAndIdx
    println(f"[graph-filtered] n=$n%,d graph built in $tBuild%.1fs")

    val queries = corpus.where(col("vec_id") < qn)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val entries = idx.searchAll(queries, 32, Double.MaxValue,
        ExactNN.Cosine)
      .select(col("query_id"), col("vec_id").as("node")).persist()
    entries.count()

    def recallOf(pred: org.apache.spark.sql.DataFrame,
                 gt: org.apache.spark.sql.DataFrame): Double =
      graft.eval.Eval.setPrecisionRecall(
          pred.select(col("query_id"), col("vec_id")),
          gt.select(col("query_id"), col("vec_id")))
        .agg(avg("recall")).head().getDouble(0)

    // selectivity sweep: ~50%, 10%, 2% (the last sits in the
    // beamFromFiltered exact-dispatch region)
    val predicates = Seq(
      ("50% (vec_id % 2 = 0)", col("vec_id") % 2 === 0),
      ("10% (vec_id % 10 = 3)", col("vec_id") % 10 === 3),
      ("2% (vec_id % 50 = 0)", pmod(col("vec_id"), lit(50)) === 0))
    // unfiltered reference on the same protocol
    val (unf, tUnf) = ProbeGen.timed {
      val r = GraphSearch.beamFrom(g, corpus, "vec_id", "embedding",
        queries, entries, k, 32, 4, ExactNN.Cosine,
        symmetrize = false).persist()
      r.count(); r
    }
    val gtAll = ExactNN.topKAgg(queries, corpus, k, ExactNN.Cosine).persist()
    println(f"[graph-filtered] unfiltered: recall=${recallOf(unf, gtAll)}%.4f " +
      f"t=$tUnf%.1fs (${tUnf / qn * 1000}%.1f ms/q)")
    unf.unpersist(); gtAll.unpersist()

    predicates.foreach { case (label, p) =>
      val subset = corpus.where(p).persist()
      val gt = ExactNN.topKAgg(queries, subset, k, ExactNN.Cosine).persist()
      gt.count()
      // (a) the plain pool-walk at the default beam, (b) over-expanded
      // beams (the probe-then-filter over-provisioning idiom: the walk
      // must VISIT ~k/selectivity nodes for k allowed to be among
      // them), (c) filter-aware seeding — entries from the LSH probe
      // restricted to the allowed subset, so the descent STARTS in
      // allowed regions instead of hoping to pass through them
      def walkAt(width: Int, ent: org.apache.spark.sql.DataFrame) =
        ProbeGen.timed {
          val r = GraphSearch.beamFrom(g, corpus, "vec_id", "embedding",
            queries, ent, k, width, 4, ExactNN.Cosine,
            symmetrize = false, allowed = Some(p)).persist()
          r.count(); r
        }
      val sweep = Seq(32, 128).map { w =>
        val (r, t) = walkAt(w, entries)
        val s = f"w=$w recall=${recallOf(r, gt)}%.4f ${t / qn * 1000}%.1f ms/q"
        r.unpersist(); s
      }
      val (fseed, tFs) = ProbeGen.timed {
        idx.searchAll(queries, 32, Double.MaxValue, ExactNN.Cosine,
            allowed = Some(subset.select(col("vec_id"))))
          .select(col("query_id"), col("vec_id").as("node")).persist()
      }
      fseed.count()
      val (fwalk, tFw) = walkAt(32, fseed)
      // the density-aware route (round 15): decision printed alongside
      // the dispatch row, so the table shows WHICH path served it —
      // the auto path must recover 1.0 exactly where the fixed walk
      // measured 0.22 (10% selectivity, starved local neighborhoods)
      val dec = GraphSearch.filteredDecision(g, corpus, "vec_id",
        "embedding", queries, entries, k, 32, p, ExactNN.Cosine,
        symmetrize = false)
      val (disp, tD) = ProbeGen.timed {
        val r = GraphSearch.beamFromFiltered(g, corpus, "vec_id",
          "embedding", queries, entries, k, 32, 4, p,
          ExactNN.Cosine, symmetrize = false).persist()
        r.count(); r
      }
      println(f"[graph-filtered] $label: ${sweep.mkString("; ")}; " +
        f"filtered-seeded w=32 recall=${recallOf(fwalk, gt)}%.4f " +
        f"${(tFs + tFw) / qn * 1000}%.1f ms/q; " +
        f"dispatch[route=${dec.route.name} medianLocal=" +
        f"${dec.medianLocalAllowed.getOrElse(-1.0)}%.1f] " +
        f"recall=${recallOf(disp, gt)}%.4f " +
        f"${tD / qn * 1000}%.1f ms/q")
      fwalk.unpersist(); fseed.unpersist(); disp.unpersist()
      gt.unpersist(); subset.unpersist()
    }

    // ---- filter-aware augmentation (KnnGraph.fromLshSameLabel +
    // GraphSearch.labelRing): build-time label edges + filtered seeds,
    // the FilteredDiskANN answer to the density-bound recall above ----
    Seq(("10% (label10 = 3)", "label10", lit(3)),
        ("2% (label50 = 0)", "label50", lit(0)))
      .foreach { case (label, lcol, lval) =>
        val p = col(lcol) === lval
        val (augG, tAug) = ProbeGen.timed {
          g.unionByName(KnnGraph.fromLshSameLabel(idx, corpus, "vec_id",
              "embedding", lcol, 8, ExactNN.Cosine,
              maxBucketOccupancy = 50).select(col("src"), col("dst")))
            .unionByName(GraphSearch.labelRing(corpus, "vec_id", lcol))
            .dropDuplicates("src", "dst")
            .localCheckpoint()
        }
        val subset = corpus.where(p).persist()
        val gt = ExactNN.topKAgg(queries, subset, k, ExactNN.Cosine)
          .persist()
        gt.count()
        val fseed = idx.searchAll(queries, 32, Double.MaxValue,
            ExactNN.Cosine, allowed = Some(subset.select(col("vec_id"))))
          .select(col("query_id"), col("vec_id").as("node")).persist()
        fseed.count()
        val (walk, tW) = ProbeGen.timed {
          val r = GraphSearch.beamFrom(augG, corpus, "vec_id", "embedding",
            queries, fseed, k, 32, 4, ExactNN.Cosine,
            symmetrize = false, allowed = Some(p)).persist()
          r.count(); r
        }
        println(f"[graph-filtered] AUGMENTED $label: recall=" +
          f"${recallOf(walk, gt)}%.4f ${tW / qn * 1000}%.1f ms/q " +
          f"(label edges+ring built in $tAug%.1fs)")
        walk.unpersist(); fseed.unpersist(); gt.unpersist()
        subset.unpersist()
      }
    spark.stop()
  }
}
