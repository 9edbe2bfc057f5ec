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
  * SPARK_GRAFT_DIMS widens the 64-d base embedding by tiling it with
  * per-tile deterministic jitter (AngularScaleProbe's 256-d recipe) and
  * slicing to exactly `dims` — how the Fashion-MNIST baseline shape
  * (60k x 784-d, BASELINE.md rows 1-6) is reproduced from the testdata.
  * The L2 accept radius scales with sqrt(dims/64): tiling scales
  * between-vector distances by the same factor.
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
    val dims = sys.env.getOrElse("SPARK_GRAFT_DIMS", "64").toInt
    val base0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val base =
      if (dims == 64) base0
      else {
        val tiles = (dims + 63) / 64
        base0.select(col("vec_id"),
          slice(flatten(transform(sequence(lit(0), lit(tiles - 1)), t =>
            transform(col("embedding"), (x, i) =>
              x + (pmod(xxhash64(t, col("vec_id"), i), lit(1000))
                .cast("double") - 500.0) / 5000.0))), 1, dims).as("embedding"))
      }
    val threshold = 1.4 * math.sqrt(dims / 64.0)
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

      // The two timed exact passes cost ~2x250 s at 1M x 128d and never
      // change between sweep invocations over the same corpus; skip them
      // (speedup column reads n/a) when only the LSH operating points are
      // under study. Ground truth below is still exact and always computed.
      val skipExact = sys.env.get("SPARK_GRAFT_SKIP_EXACT").contains("1")
      val (tExact0, tExact) =
        if (skipExact) (Double.NaN, Double.NaN)
        else {
          val (_, a) = time(ExactNN.topK(queries, corpus, 10).count())
          val (_, b) = time(ExactNN.topK(queries, corpus, 10).count())
          (a, b)
        }
      // ground truth computed once and cached for both index recalls
      val gt = ExactNN.topK(queries, corpus, 10, ExactNN.L2,
        threshold = Some(threshold)).persist()
      gt.count()

      // Same knobs as AngularScaleProbe: sampleCap sizes the fit sample
      // to the corpus (occupancy rule, SCALE.md §ANN); PROBE_CONFIGS
      // sweeps (nTrees,kMinVecs) operating points — e.g. a leaner forest
      // targeting the reference's published 0.94-recall band instead of
      // recall 1.0.
      val sampleCap = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_CAP", "100000").toInt
      // blank SPARK_GRAFT_PROBE_CONFIGS skips the LSH block entirely
      // (e.g. an IVF-PQ-only probe run)
      val sweep = sys.env.get("SPARK_GRAFT_PROBE_CONFIGS").map { s =>
        s.split(";").toSeq.filter(_.trim.nonEmpty).map { c =>
          val Array(t, km) = c.split(","); (t.toInt, km.toInt)
        }
      }
      // the comment at skipExact promises the speedup column "reads n/a"
      // — format it conditionally (NaN would trip downstream log parsing)
      def ratio(denom: Double): String =
        if (skipExact) "n/a" else f"${tExact / denom}%.1fx"
      val exactStr =
        if (skipExact) "n/a" else f"${tExact}%.2fs (warm ${tExact0}%.2f)"
      for ((nTrees, kMin) <- sweep.getOrElse(Seq((20, 80)))) {
        val (idx, tTrain) = time {
          val i = Lsh.train(corpus, "vec_id", "embedding",
            LshConfig(nTrees = nTrees, kMinVecs = kMin, seed = 42L,
              sampleCap = sampleCap))
          i.buckets.persist().count()
          i.vectors.persist().count()
          i
        }
        val (_, tLsh0) = time(idx.searchAll(queries, 10, threshold).count())
        val (_, tLsh) = time(idx.searchAll(queries, 10, threshold).count())
        val recall = Eval.setPrecisionRecall(idx.searchAll(queries, 10, threshold), gt)
          .agg(avg("recall")).head().getDouble(0)

        println(f"[scale] corpus=$n%,d dims=$dims nTrees=$nTrees kMin=$kMin cap=$sampleCap " +
          f"exact=$exactStr " +
          f"train=${tTrain}%.2fs lsh=${tLsh}%.2fs (warm ${tLsh0}%.2f) " +
          f"speedup=${ratio(tLsh)} recall=$recall%.3f")
        idx.buckets.unpersist(); idx.vectors.unpersist()
      }

      // IVF-PQ (opt-in: SPARK_GRAFT_IVFPQ=1): the compressed + pruned
      // deployment index — ADC over residual codes in probed cells, then
      // exact re-rank. Measured separately from the always-on pair since
      // its two-quantizer fit is the most expensive.
      if (sys.env.get("SPARK_GRAFT_IVFPQ").contains("1")) {
        val nCells = math.min(1024, math.max(16, math.sqrt(n.toDouble).toInt))
        val nProbe = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_PROBES",
          math.max(4, nCells / 8).toString).toInt
        val depth = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_DEPTH", "100").toInt
        val ipCfg = graft.ann.ivfpq.IvfPqConfig(
          nCells = nCells, nProbe = nProbe,
          numSubvectors = 16, codesPerSubvector = 256, iters = 5,
          seed = 42L, sampleCap = sampleCap)
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
        val adcRecall = Eval.setPrecisionRecall(ip.searchAll(queries, 10), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d ivfpq(nCells=$nCells, nProbe=$nProbe, " +
          f"m=${ipCfg.numSubvectors}, k=${ipCfg.codesPerSubvector}, depth=$depth): " +
          f"train=${tIpTrain}%.2fs rerank_search=${tIp}%.2fs (warm ${tIp0}%.2f) " +
          f"recall=$ipRecall%.3f adc_recall=$adcRecall%.3f")
        ip.codes.unpersist()
      }

      // IVF-SQ (opt-in: SPARK_GRAFT_IVFSQ=1): cell pruning x 1-byte/dim
      // codes — the cheap-fit middle of the IVF family (no product
      // codebooks; SQ bounds are one aggregation pass).
      if (sys.env.get("SPARK_GRAFT_IVFSQ").contains("1")) {
        val nCells = math.min(1024, math.max(16, math.sqrt(n.toDouble).toInt))
        val nProbe = sys.env.getOrElse("SPARK_GRAFT_IVFSQ_PROBES",
          math.max(4, nCells / 16).toString).toInt
        val depth = sys.env.getOrElse("SPARK_GRAFT_IVFSQ_DEPTH", "500").toInt
        val isCfg = graft.ann.ivfsq.IvfSqConfig(
          nCells = nCells, nProbe = nProbe, iters = 5,
          seed = 42L, sampleCap = sampleCap)
        val (is, tIsTrain) = time {
          val i = graft.ann.ivfsq.IvfSq.train(corpus, "vec_id", "embedding", isCfg)
          i.codes.persist().count()
          i
        }
        val vecs = corpus.select(col("vec_id"), col("embedding"))
        val (_, tIs0) = time(is.searchRerank(queries, vecs, 10, depth).count())
        val (_, tIs) = time(is.searchRerank(queries, vecs, 10, depth).count())
        val isRecall = Eval.setPrecisionRecall(
          is.searchRerank(queries, vecs, 10, depth), gt)
          .agg(avg("recall")).head().getDouble(0)
        val scanRecall = Eval.setPrecisionRecall(is.searchAll(queries, 10), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d ivfsq(nCells=$nCells, nProbe=$nProbe, " +
          f"depth=$depth): train=${tIsTrain}%.2fs rerank_search=${tIs}%.2fs " +
          f"(warm ${tIs0}%.2f) recall=$isRecall%.3f scan_recall=$scanRecall%.3f")
        is.codes.unpersist()
      }

      // SQ8 (opt-in: SPARK_GRAFT_SQ=1): the near-lossless 4-8x
      // footprint cut — quantized full scan (+ optional exact rerank),
      // no pruning. The interesting scale question is the quantized
      // scan's latency vs the float exact scan at the same recall.
      if (sys.env.get("SPARK_GRAFT_SQ").contains("1")) {
        val depth = sys.env.getOrElse("SPARK_GRAFT_SQ_DEPTH", "100").toInt
        val (sq, tSqTrain) = time {
          val i = graft.ann.sq.Sq.train(corpus, "vec_id", "embedding")
          i.codes.persist().count()
          i
        }
        val (_, tSq0) = time(sq.searchAll(queries, 10).count())
        val (_, tSq) = time(sq.searchAll(queries, 10).count())
        val sqRecall = Eval.setPrecisionRecall(sq.searchAll(queries, 10), gt)
          .agg(avg("recall")).head().getDouble(0)
        val vecs = corpus.select(col("vec_id"), col("embedding"))
        val (_, tRr) = time(sq.searchRerank(queries, vecs, 10, depth).count())
        val rrRecall = Eval.setPrecisionRecall(
          sq.searchRerank(queries, vecs, 10, depth), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d sq(levels=255, depth=$depth): " +
          f"train=${tSqTrain}%.2fs scan_search=${tSq}%.2fs (warm ${tSq0}%.2f) " +
          f"scan_recall=$sqRecall%.3f rerank_search=${tRr}%.2fs " +
          f"rerank_recall=$rrRecall%.3f speedup=${ratio(tSq)}")
        sq.codes.unpersist()
      }

      // BQ (opt-in: SPARK_GRAFT_BQ=1): the 32x-compression endpoint —
      // XOR+popcount Hamming scan over packed sign bits + exact rerank.
      // The scale question is the Hamming scan's latency (it reads 1/32
      // of SQ's bytes) and how deep the rerank must go to recover
      // recall at 1 bit/dim (depth scales with corpus fraction — the
      // BQ depth rule, SCALE.md §ANN).
      if (sys.env.get("SPARK_GRAFT_BQ").contains("1")) {
        val depth = sys.env.getOrElse("SPARK_GRAFT_BQ_DEPTH", "2000").toInt
        val (bq, tBqTrain) = time {
          val i = graft.ann.bq.Bq.train(corpus, "vec_id", "embedding")
          i.codes.persist().count()
          i
        }
        def scanPred = bq.searchHamming(queries, 10)
          .select(col("query_id"), col("vec_id"))
        val (_, tBq0) = time(scanPred.count())
        val (_, tBq) = time(scanPred.count())
        val bqRecall = Eval.setPrecisionRecall(scanPred, gt)
          .agg(avg("recall")).head().getDouble(0)
        val vecs = corpus.select(col("vec_id"), col("embedding"))
        val (_, tRr) = time(bq.searchRerank(queries, vecs, 10, depth).count())
        val rrRecall = Eval.setPrecisionRecall(
          bq.searchRerank(queries, vecs, 10, depth), gt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d bq(words=${bq.model.nWords}, " +
          f"depth=$depth): train=${tBqTrain}%.2fs " +
          f"scan_search=${tBq}%.2fs (warm ${tBq0}%.2f) " +
          f"scan_recall=$bqRecall%.3f rerank_search=${tRr}%.2fs " +
          f"rerank_recall=$rrRecall%.3f speedup=${ratio(tBq)}")
        bq.codes.unpersist()
      }

      // IVF measured only outside sweep mode (an LSH operating-point
      // sweep doesn't need the k-means fit re-run per invocation).
      if (sweep.isEmpty) {
        val nCells = math.max(16, math.sqrt(n.toDouble).toInt)
        val (ivf, tIvfTrain) = time {
          val i = Ivf.train(corpus, "vec_id", "embedding",
            IvfConfig(nCells = nCells, nProbe = nCells / 4, seed = 42L,
              sampleCap = sampleCap))
          i.cells.persist().count()
          i.vectors.persist().count()
          i
        }
        val (_, tIvf0) = time(ivf.searchAll(queries, 10).count())
        val (_, tIvf) = time(ivf.searchAll(queries, 10).count())
        val ivfRecall = Eval.setPrecisionRecall(
          ivf.searchAll(queries, 10), gt).agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d ivf(nCells=$nCells, nProbe=${nCells / 4}): " +
          f"train=${tIvfTrain}%.2fs search=${tIvf}%.2fs (warm ${tIvf0}%.2f) " +
          f"speedup=${ratio(tIvf)} recall=$ivfRecall%.3f")
        ivf.cells.unpersist(); ivf.vectors.unpersist()
      }

      // Constrained (filtered) ANN (opt-in: SPARK_GRAFT_FILTERED=1):
      // the allow-list (even vec_id, ~50% selective) lands between
      // candidate retrieval and scoring; recall graded against the
      // FILTERED exact ground truth. The question at scale is whether
      // the candidates-broadcast-into-allowlist join adds measurable
      // cost over the unfiltered search at the same operating point.
      if (sys.env.get("SPARK_GRAFT_FILTERED").contains("1")) {
        val fTrees = sys.env.getOrElse("SPARK_GRAFT_FILTERED_TREES", "20").toInt
        val (idx, tTrain) = time {
          val i = Lsh.train(corpus, "vec_id", "embedding",
            LshConfig(nTrees = fTrees, kMinVecs = 80, seed = 42L,
              sampleCap = sampleCap))
          i.buckets.persist().count()
          i.vectors.persist().count()
          i
        }
        // SPARK_GRAFT_FILTERED_HASH=1 switches the predicate from id
        // parity (perfectly correlated with replica-cluster identity —
        // the adversarial case) to xxhash64 parity (independent of the
        // geometry — the typical metadata filter)
        val allowed =
          if (sys.env.get("SPARK_GRAFT_FILTERED_HASH").contains("1"))
            corpus.where(pmod(xxhash64(col("vec_id")), lit(2)) === 0)
          else corpus.where(pmod(col("vec_id"), lit(2)) === 0)
        def filteredPred = idx.searchAll(queries, 10, threshold,
          allowed = Some(allowed.select("vec_id")))
        val (_, tF0) = time(filteredPred.count())
        val (_, tF) = time(filteredPred.count())
        val (_, tU) = time(idx.searchAll(queries, 10, threshold).count())
        val fgt = ExactNN.topK(queries, allowed, 10, ExactNN.L2,
          threshold = Some(threshold))
        val fRecall = Eval.setPrecisionRecall(filteredPred, fgt)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[scale] corpus=$n%,d filtered(sel=0.5, nTrees=$fTrees): " +
          f"train=${tTrain}%.2fs filtered_search=${tF}%.2fs (warm ${tF0}%.2f) " +
          f"unfiltered_search=${tU}%.2fs recall_vs_filtered_gt=$fRecall%.3f")

        // Selectivity DISPATCH (round 11): a 2%-selective predicate, in
        // both correlation regimes (replicas share vec_id % 50 because
        // baseN % 50 == 0 — correlated; xxhash parity-of-50 —
        // uncorrelated). Probe-then-filter recall collapses here (the
        // probed buckets hold almost no allowed rows); searchAllFiltered
        // dispatches to the exact scan over the ~2% subset (recall 1.0
        // by construction) — the measured question is its LATENCY,
        // including the dispatch's own count jobs.
        for ((tag, a) <- Seq(
            "correlated" -> corpus.where(pmod(col("vec_id"), lit(50)) === 0),
            "uncorrelated" -> corpus.where(
              pmod(xxhash64(col("vec_id")), lit(50)) === 0))) {
          val fgt2 = ExactNN.topK(queries, a, 10, ExactNN.L2,
            threshold = Some(threshold))
          def ptf = idx.searchAll(queries, 10, threshold,
            allowed = Some(a.select("vec_id")))
          val (_, tP) = time(ptf.count())
          val pRec = Eval.setPrecisionRecall(ptf, fgt2)
            .agg(avg("recall")).head().getDouble(0)
          def disp = idx.searchAllFiltered(queries, a, 10, threshold)
          val (_, tD0) = time(disp.count())
          val (_, tD) = time(disp.count())
          val dRec = Eval.setPrecisionRecall(disp, fgt2)
            .agg(avg("recall")).head().getDouble(0)
          println(f"[scale] corpus=$n%,d selective2pct($tag): " +
            f"probe_then_filter=${tP}%.2fs recall=$pRec%.3f | " +
            f"dispatch_exact=${tD}%.2fs (warm ${tD0}%.2f) recall=$dRec%.3f")
        }
        idx.buckets.unpersist(); idx.vectors.unpersist()
      }

      // Matryoshka truncated-prefix serving (opt-in: SPARK_GRAFT_MRL=1):
      // candidate generation on the first `prefix` components, exact
      // full-dim rerank at `depth`. The synthetic embeddings are iid
      // across components (NO MRL-style prefix concentration), so this
      // measures the WORST case: prefix recall is governed purely by the
      // prefix/d energy fraction and the rerank depth — the honest lower
      // bound a deployment would compare its trained-embedding numbers
      // against. Sweep via SPARK_GRAFT_MRL_POINTS="prefix,depth;...".
      if (sys.env.get("SPARK_GRAFT_MRL").contains("1")) {
        val points = sys.env.getOrElse("SPARK_GRAFT_MRL_POINTS",
            s"${dims / 4},100;${dims / 4},1000;${dims / 2},100")
          .split(";").toSeq.filter(_.trim.nonEmpty).map { p =>
            val Array(pf, d) = p.split(","); (pf.toInt, d.toInt)
          }
        for ((prefix, depth) <- points) {
          def mrl = graft.ann.Matryoshka.searchAll(
            queries, corpus, 10, prefix, depth)
          val (_, tM0) = time(mrl.count())
          val (_, tM) = time(mrl.count())
          val mRecall = Eval.setPrecisionRecall(mrl, gt)
            .agg(avg("recall")).head().getDouble(0)
          println(f"[scale] corpus=$n%,d mrl(dims=$dims, prefix=$prefix, " +
            f"depth=$depth): search=${tM}%.2fs (warm ${tM0}%.2f) " +
            f"recall=$mRecall%.3f speedup=${ratio(tM)}")
        }
      }

      corpus.unpersist(); gt.unpersist()
    }
    spark.stop()
  }
}
