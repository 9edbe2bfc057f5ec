package graft.ann.ivfsq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** IVF-SQ: deterministic two-quantizer fit, code/cell invariants,
  * cell-pruned quantized scan + exact rerank recall, angular mode,
  * persistence round-trip. */
class IvfSqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val cfg = IvfSqConfig(nCells = 8, nProbe = 4, seed = 42L)

  test("every vector gets one cell and a full-length in-range code row") {
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg)
    val rows = idx.codes.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < cfg.nCells)
      val cs = r.getSeq[Int](2)
      assert(cs.length === idx.sq.dims)
      assert(cs.forall(c => c >= 0 && c <= cfg.levels))
    }
    // deterministic: same seed, same cells and codes
    val again = IvfSq.train(emb, "vec_id", "embedding", cfg)
    assert(again.codes.orderBy("vec_id").collect().toSeq ===
      idx.codes.orderBy("vec_id").collect().toSeq)
  }

  test("quantized scan is near-lossless; exact rerank recovers exact NN") {
    val q = emb.orderBy("vec_id").limit(30)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfSq.train(emb, "vec_id", "embedding",
      cfg.copy(nProbe = 8)) // probe all cells: isolates the SQ error
    val gt = ExactNN.topK(q, emb, 10, ExactNN.L2)
    val scan = graft.eval.Eval.setPrecisionRecall(idx.searchAll(q, 10), gt)
      .agg(avg("recall")).as[Double].head()
    assert(scan >= 0.95, s"all-cell quantized scan recall $scan")
    val rer = graft.eval.Eval.setPrecisionRecall(
      idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 10, 100), gt)
      .agg(avg("recall")).as[Double].head()
    assert(rer === 1.0, s"rerank recall $rer != 1.0")
  }

  test("cell pruning binds: nProbe < nCells scans only probed cells") {
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg.copy(nProbe = 2))
    val probed = idx.ivf.probeRows(
        q.select($"query_id", $"qv".cast("array<double>").as("qv")),
        "query_id", "qv")
      .select("cell").distinct().as[Int].collect().toSet
    val returnedCells = idx.searchAll(q, 10)
      .join(idx.codes, "vec_id").select("cell").distinct()
      .as[Int].collect().toSet
    assert(returnedCells.subsetOf(probed),
      s"returned cells $returnedCells outside probed $probed")
    assert(probed.size < cfg.nCells)
  }

  test("angular mode: cosine rerank == exact cosine NN") {
    val q = emb.orderBy("vec_id").limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfSq.train(emb, "vec_id", "embedding",
      cfg.copy(angular = true, nProbe = 8))
    val gt = ExactNN.topK(q, emb, 10, ExactNN.Cosine)
    val rer = graft.eval.Eval.setPrecisionRecall(
      idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 10, 100), gt)
      .agg(avg("recall")).as[Double].head()
    assert(rer === 1.0, s"angular rerank recall $rer != 1.0")
  }

  test("streamed encode equals the batch encode (incremental codes append)") {
    // both quantizer transforms are stateless projections over fixed
    // models, so newly arriving vectors stream into the codes table
    // without a refit — the IVF-PQ streaming-append story at SQ cost
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg)
    val arriving = emb.limit(30)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Seq[Int])]()
    val streamCodes = mem.toDF().toDF("vec_id", "embedding")
      .select($"vec_id",
        graft.ann.ivf.IvfExpressions.ivfCell(idx.ivf, $"embedding").as("cell"),
        idx.sq.encodeCol($"embedding").as("codes"))
    val q = streamCodes.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.as[(Long, Int, Seq[Int])].collect().foreach(out.add)
      }
      .outputMode("append").start()
    try {
      mem.addData(arriving: _*)
      q.processAllAvailable()
    } finally q.stop()
    val expect = idx.codes.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === arriving.size)
    out.forEach { r => assert(r === expect(r._1)) }
  }

  test("rerank-depth rule: shallow iff depth under 2.5% of probed rows") {
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg)
    // nProbe/nCells = 4/8: at a 1M corpus, probed rows = 500k and the
    // 2.5% threshold is 12_500
    assert(idx.rerankDepthShallow(12_499, 1_000_000L))
    assert(!idx.rerankDepthShallow(12_500, 1_000_000L))
    // the board's own shape (500 vectors) is NOT shallow at depth 100 —
    // the rule is a scale guard, not noise on small corpora
    assert(!idx.rerankDepthShallow(100, 500L))
  }

  test("codesFilter: scan-side predicate == search over a pre-filtered codes table; rerank honors it") {
    val q = emb.orderBy("vec_id").limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg)
    val pred = $"vec_id" % 2 === 0
    val filtered = idx.searchAll(q, 5, codesFilter = Some(pred))
      .orderBy("query_id", "dist", "vec_id").collect()
    assert(filtered.forall(_.getLong(1) % 2 == 0), "disallowed id returned")
    val preCut = new IvfSqIndex(idx.config, idx.ivf, idx.sq,
        idx.codes.where(pred))
      .searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    assert(filtered === preCut)
    val rer = idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 5,
        rerankDepth = 50, codesFilter = Some(pred)).collect()
    assert(rer.forall(_.getLong(1) % 2 == 0), "rerank leaked a disallowed id")
  }

  test("save/load round-trip: same models, same search rows") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq_idx").toString
    val idx = IvfSq.train(emb, "vec_id", "embedding", cfg)
    idx.save(spark, dir)
    val re = IvfSq.load(spark, dir)
    assert(re.sq.mins.toSeq === idx.sq.mins.toSeq)
    assert(re.ivf.centroids.map(_.toSeq).toSeq ===
      idx.ivf.centroids.map(_.toSeq).toSeq)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val a = idx.searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    val b = re.searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    assert(a === b)
  }
}
