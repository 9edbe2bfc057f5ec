package graft.ann.sq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** Scalar quantization: exact (sample-free) fit, code-range and
  * reconstruction invariants, quantized-scan recall against exact NN,
  * persistence round-trip, degenerate-dimension handling. */
class SqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("fit recovers the exact per-dimension min/max") {
    val model = Sq.fit(emb, "embedding")
    val vecs = emb.select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect()
    val dims = vecs.head.length
    assert(model.dims === dims)
    (0 until dims).foreach { i =>
      assert(model.mins(i) === vecs.map(_(i)).min)
      assert(model.maxs(i) === vecs.map(_(i)).max)
    }
  }

  test("codes in range; corpus values never clamp; decode within scale/2 per dim") {
    val idx = Sq.train(emb, "vec_id", "embedding")
    val m = idx.model
    val codes = idx.codes.collect()
    assert(codes.length === emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === m.dims)
      assert(cs.forall(c => c >= 0 && c <= m.levels))
    }
    // decode error bound: |x - (min + code*scale)| <= scale/2 for
    // in-range values (half-up rounding)
    val dec = idx.codes.select($"vec_id", m.decodeCol($"codes").as("dec"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    orig.foreach { case (id, v) =>
      v.indices.foreach { i =>
        val tol = m.scales(i) / 2 + 1e-12
        assert(math.abs(v(i) - dec(id)(i)) <= tol,
          s"dim $i of vec $id off by ${math.abs(v(i) - dec(id)(i))}")
      }
    }
  }

  test("constant dimension encodes to 0 and decodes exactly") {
    val df = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(2.0f, 5.0f)),
      (3L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val idx = Sq.train(df, "vec_id", "embedding")
    assert(idx.model.scales(1) === 0.0)
    val codes = idx.codes.orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(codes.forall(_._2(1) === 0))
    val dec = idx.codes.select(idx.model.decodeCol($"codes").as("d"))
      .as[Seq[Double]].collect()
    assert(dec.forall(_(1) === 5.0))
  }

  test("quantized scan at 255 levels recovers exact-NN top-k (near-lossless)") {
    val q = emb.orderBy("vec_id").limit(30)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Sq.train(emb, "vec_id", "embedding")
    val gt = ExactNN.topK(q, emb, 10, ExactNN.L2)
    val pred = idx.searchAll(q, 10)
    val recall = graft.eval.Eval.setPrecisionRecall(pred, gt)
      .agg(avg("recall")).as[Double].head()
    assert(recall >= 0.95, s"SQ8 scan recall $recall below near-lossless band")
    // and the rerank form is exactly the exact-NN result
    val rer = idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 10, 100)
    val rerRecall = graft.eval.Eval.setPrecisionRecall(rer, gt)
      .agg(avg("recall")).as[Double].head()
    assert(rerRecall === 1.0, s"rerank recall $rerRecall != 1.0")
  }

  test("codesFilter: scan-side predicate == search over a pre-filtered codes table; rerank honors it") {
    val q = emb.orderBy("vec_id").limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Sq.train(emb, "vec_id", "embedding")
    val pred = $"vec_id" % 2 === 0
    val filtered = idx.searchAll(q, 5, codesFilter = Some(pred))
      .orderBy("query_id", "dist", "vec_id").collect()
    assert(filtered.forall(_.getLong(1) % 2 == 0), "disallowed id returned")
    // identical to an index holding only the allowed code rows
    val preCut = new SqIndex(idx.model, idx.codes.where(pred))
      .searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    assert(filtered === preCut)
    // rerank threads the predicate into candidate retrieval
    val rer = idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 5,
        rerankDepth = 50, codesFilter = Some(pred)).collect()
    assert(rer.forall(_.getLong(1) % 2 == 0), "rerank leaked a disallowed id")
  }

  test("save/load round-trip: same bounds, same codes, same search rows") {
    val dir = java.nio.file.Files.createTempDirectory("sq_idx").toString
    val idx = Sq.train(emb, "vec_id", "embedding")
    idx.save(spark, dir)
    val re = Sq.load(spark, dir)
    assert(re.model.mins.toSeq === idx.model.mins.toSeq)
    assert(re.model.maxs.toSeq === idx.model.maxs.toSeq)
    assert(re.model.levels === idx.model.levels)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val a = idx.searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    val b = re.searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect()
    assert(a === b)
  }

  test("streamed encode equals the batch encode (incremental codes append)") {
    // The SQ encode is a pure map-side projection over fixed bounds, so
    // it runs unchanged over a readStream of arriving vectors — the
    // codes-append path that keeps the compressed table fresh without a
    // refit (bounds drift on genuinely new data ranges is an operator
    // decision: refit or accept clamping, both deterministic).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = Sq.fit(emb, "embedding")
    // orderBy before limit: bare limit is not deterministic across
    // the two jobs that evaluate this subset
    val arriving = emb.orderBy("vec_id").limit(40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    val q = model.transformDf(mem.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.as[(Long, Seq[Int])].collect().foreach(out.add)
      }
      .outputMode("append").start()
    try {
      mem.addData(arriving: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batchCodes = model.transformDf(emb.orderBy("vec_id").limit(40),
        "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toMap
    assert(out.size === arriving.size)
    out.forEach { case (id, cs) => assert(cs === batchCodes(id)) }
  }

  test("ragged or null embeddings fail the fit with a named error") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sq.fit(ragged, "embedding")
    }
    assert(e.getMessage.contains("ragged"))
  }
}
