package graft.ann.ivfpq

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN
import graft.ann.pq.{Pq, PqConfig}

/** IVF-PQ (IVFADC): deterministic fit, struct-encode invariants, the
  * native expression vs driver-side encode, residual quantization beating
  * raw-vector quantization at the same code budget (the reason the
  * composition exists), rerank recall, and the save/load round-trip. */
class IvfPqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val cfg = IvfPqConfig(nCells = 16, nProbe = 8,
    numSubvectors = 16, codesPerSubvector = 16, seed = 42L)

  test("deterministic fit; cell and codes within range; one row per vector") {
    val a = IvfPq.fit(emb, "embedding", cfg)
    val b = IvfPq.fit(emb, "embedding", cfg)
    assert(a.ivf.centroids.map(_.toSeq).toSeq === b.ivf.centroids.map(_.toSeq).toSeq)
    assert(a.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      b.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    val rows = idx.codes.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      val cell = r.getInt(1)
      assert(cell >= 0 && cell < cfg.nCells)
      val cs = r.getSeq[Int](2)
      assert(cs.length === cfg.numSubvectors)
      assert(cs.forall(c => c >= 0 && c < cfg.codesPerSubvector))
    }
  }

  test("native encode expression matches driver-side encode, float and double input") {
    val model = IvfPq.fit(emb, "embedding", cfg)
    val direct = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        val (cell, codes) = model.encode(v.toArray)
        id -> ((cell, codes.toSeq))
      }.toMap
    // ARRAY<FLOAT> (parquet layout) and explicit ARRAY<DOUBLE> must both
    // agree with the driver-side encoder
    Seq(emb,
      emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding")))
      .foreach { df =>
        model.transform(df, "vec_id", "embedding").collect().foreach { r =>
          assert((r.getInt(1), r.getSeq[Int](2)) === direct(r.getLong(0)))
        }
      }
  }

  test("residual ADC distance expression equals driver-side table lookup") {
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val model = idx.model
    val qvs = q.select($"query_id", $"qv".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val enc = idx.codes.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    idx.searchAll(q, 3, roundTo = 9).collect().foreach { r =>
      val (cell, codes) = enc(r.getLong(1))
      val table = model.pq.adcTable(
        model.residual(qvs(r.getLong(0)).toArray, cell))
      val expect = model.pq.adcDist(table, codes)
      assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    }
  }

  test("residual quantization reconstructs better than raw-vector PQ at the same budget") {
    val model = IvfPq.fit(emb, "embedding", cfg)
    val plain = Pq.fit(emb, "embedding",
      PqConfig(numSubvectors = cfg.numSubvectors,
        codesPerSubvector = cfg.codesPerSubvector, seed = cfg.seed))
    val vecs = emb.select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect()
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val (resErr, rawErr) = vecs.map { sv =>
      val v = sv.toArray
      val (cell, codes) = model.encode(v)
      val rec = model.pq.decode(codes)
      val cent = model.ivf.centroids(cell)
      val resRec = rec.indices.map(i => rec(i) + cent(i)).toArray
      (l2(v, resRec), l2(v, plain.decode(plain.encode(v))))
    }.unzip match { case (a, b) => (a.sum / a.length, b.sum / b.length) }
    assert(resErr < rawErr,
      s"avg residual-PQ reconstruction $resErr vs raw-PQ $rawErr")
  }

  test("ADC + exact re-rank recovers exact-NN neighbors (the deployment shape)") {
    val q = emb.orderBy("vec_id").limit(50)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    val gt = ExactNN.topK(q, emb, 10, ExactNN.L2)

    val adcRecall = graft.eval.Eval.setPrecisionRecall(
      idx.searchAll(q, 10), gt).agg(avg("recall")).head().getDouble(0)
    assert(adcRecall >= 0.4, s"raw IVF-ADC recall $adcRecall")

    val vectors = emb.select($"vec_id", $"embedding")
    val rerankRecall = graft.eval.Eval.setPrecisionRecall(
      idx.searchRerank(q, vectors, k = 10, rerankDepth = 100), gt)
      .agg(avg("recall")).head().getDouble(0)
    assert(rerankRecall >= 0.8, s"reranked recall $rerankRecall")
    assert(rerankRecall >= adcRecall)
  }

  test("searchAll plan: probes broadcast into the codes table, no corpus-side shuffle") {
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val plan = idx.searchAll(q, 3).queryExecution.executedPlan.toString
    // candidate retrieval must be a broadcast join (probe side is tiny by
    // construction: nQueries x nProbe rows)
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty, plan)
    // the only row shuffle allowed is the per-query top-k partitioning —
    // the (corpus-sized) codes side must reach the join unshuffled
    val shuffles = "Exchange (hash|range|single)partitioning".r
      .findAllIn(plan).length
    assert(shuffles <= 1,
      s"expected at most the per-query top-k shuffle:\n$plan")
  }

  test("angular mode: quantizes the unit sphere, reranks by exact cosine, round-trips") {
    val acfg = cfg.copy(angular = true)
    val q = emb.orderBy("vec_id").limit(50)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfPq.train(emb, "vec_id", "embedding", acfg)
    val gt = ExactNN.topK(q, emb, 10, ExactNN.Cosine)
    val rerankRecall = graft.eval.Eval.setPrecisionRecall(
      idx.searchRerank(q, emb.select($"vec_id", $"embedding"), k = 10,
        rerankDepth = 100), gt)
      .agg(avg("recall")).head().getDouble(0)
    assert(rerankRecall >= 0.8, s"angular reranked recall $rerankRecall")

    val dir = Files.createTempDirectory("ivfpq_ang").toString
    idx.save(spark, dir)
    val reopened = IvfPq.load(spark, dir)
    assert(reopened.model.config.angular)
    val a = idx.searchAll(q, 10)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = reopened.searchAll(q, 10)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("streaming index maintenance: transform over a MemoryStream appends codes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val existing = emb.where($"vec_id" >= 100)
    val arriving = emb.where($"vec_id" < 100)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq

    val dir = Files.createTempDirectory("ivfpq_stream").toString
    val idx = IvfPq.train(existing, "vec_id", "embedding", cfg)
    idx.save(spark, dir)
    val before = spark.read.parquet(s"$dir/codes").count()

    // the fitted model's transform is one stateless map-side expression,
    // so it runs unchanged over a readStream — incremental code-append
    // keeps the index fresh without refitting either quantizer
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = idx.model.transform(mem.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select($"vec_id", $"cell", $"codes")
          .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
      }
      .outputMode("append").start()
    try {
      mem.addData(arriving: _*)
      q.processAllAvailable()
    } finally q.stop()

    val after = spark.read.parquet(s"$dir/codes").count()
    assert(after === before + arriving.size)
    // the reopened index now serves the streamed vectors
    val reopened = IvfPq.load(spark, dir)
    val qdf = Seq((arriving.head._1, arriving.head._2.map(_.toDouble)))
      .toDF("query_id", "qv")
    val res = reopened.searchAll(qdf, 5).collect()
    assert(res.map(_.getLong(1)).contains(arriving.head._1)) // finds itself
  }

  test("IVF-PQ index round-trip: identical search results, cell-partitioned layout") {
    val dir = Files.createTempDirectory("ivfpq_idx").toString
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    idx.save(spark, dir)
    val reopened = IvfPq.load(spark, dir)

    assert(reopened.model.ivf.centroids.map(_.toSeq).toSeq ===
      idx.model.ivf.centroids.map(_.toSeq).toSeq)
    assert(reopened.model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      idx.model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    val q = emb.orderBy("vec_id").limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val a = idx.searchAll(q, 10)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = reopened.searchAll(q, 10)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)

    // partitionBy(cell) layout on disk — the at-rest pruning contract
    val partDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(partDirs.nonEmpty)
  }

  test("codesFilter: scan-side filtered rerank == exact NN over the filtered subset") {
    // metadata stored WITH the codes (the filtered-DiskANN layout):
    // label parity joined once at build, predicate applied on the codes
    // scan — disallowed rows never scored, never consuming rerank slots
    val e = emb
    val q = e.orderBy("vec_id").limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val full = IvfPq.train(e, "vec_id", "embedding",
      cfg.copy(nProbe = cfg.nCells)) // full probe: isolates the filter
    val withMeta = new IvfPqIndex(full.model,
      full.codes.withColumn("even", $"vec_id" % 2 === 0))
    val pred = withMeta.searchRerank(q, e.select($"vec_id", $"embedding"),
        5, rerankDepth = 100, codesFilter = Some($"even"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pred.forall(_._2 % 2 == 0), "disallowed id in filtered result")
    val gt = graft.ann.ExactNN.topK(q, e.where($"vec_id" % 2 === 0), 5,
        graft.ann.ExactNN.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pred === gt, "filtered rerank diverged from exact filtered NN")
  }

  test("rerank-depth rule: shallow iff depth under 2.5% of probed rows") {
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    // nProbe/nCells = 8/16: at a 1M corpus, probed rows = 500k and the
    // 2.5% threshold is 12_500
    assert(idx.rerankDepthShallow(12_499, 1_000_000L))
    assert(!idx.rerankDepthShallow(12_500, 1_000_000L))
    // the board's own shape (500 vectors) is NOT shallow at depth 100
    assert(!idx.rerankDepthShallow(100, 500L))
  }

  test("searchAll refuses a query set beyond MaxQueryBatch with a named error") {
    val idx = IvfPq.train(emb, "vec_id", "embedding", cfg)
    // limit()-bounded collect: the oversized frame costs MaxQueryBatch+1
    // tiny rows before the guard fires, never an unbounded materialization
    val big = spark.range(IvfPq.MaxQueryBatch + 1)
      .select($"id".as("query_id"), array(Seq.fill(4)(lit(0.1)): _*).as("qv"))
    val e = intercept[IllegalArgumentException](idx.searchAll(big, 3))
    assert(e.getMessage.contains("small side"), e.getMessage)
  }
}
