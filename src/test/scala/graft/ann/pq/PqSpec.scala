package graft.ann.pq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** Product quantization: deterministic fit, code-range invariants,
  * reconstruction beats the worst case, and ADC top-k recall against
  * exact NN (tolerance-banded, reference-style §5). */
class PqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val cfg = PqConfig(numSubvectors = 16, codesPerSubvector = 16, seed = 42L)

  test("deterministic fit; codes within range; one code row per vector") {
    val a = Pq.fit(emb, "embedding", cfg)
    val b = Pq.fit(emb, "embedding", cfg)
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    val idx = Pq.train(emb, "vec_id", "embedding", cfg)
    val codes = idx.codes.collect()
    assert(codes.length === emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === cfg.numSubvectors)
      assert(cs.forall(c => c >= 0 && c < cfg.codesPerSubvector))
    }
  }

  test("native encode expression matches driver-side encode, float and double input") {
    val model = Pq.fit(emb, "embedding", cfg)
    val direct = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> model.encode(v.toArray).toSeq }.toMap
    // ARRAY<FLOAT> path (the parquet layout) and explicit ARRAY<DOUBLE>
    // must both agree with the driver-side encoder
    model.transform(emb, "vec_id", "embedding").collect()
      .foreach(r => assert(r.getSeq[Int](1) === direct(r.getLong(0))))
    model.transform(
        emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
        "vec_id", "embedding").collect()
      .foreach(r => assert(r.getSeq[Int](1) === direct(r.getLong(0))))
  }

  test("ADC distance expression equals driver-side table lookup") {
    val idx = Pq.train(emb, "vec_id", "embedding", cfg)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val model = idx.model
    val qvs = q.select($"query_id", $"qv".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val codesMap = idx.codes.as[(Long, Seq[Int])].collect().toMap
    idx.searchAll(q, 3, roundTo = 9).collect().foreach { r =>
      val expect = model.adcDist(
        model.adcTable(qvs(r.getLong(0)).toArray), codesMap(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    }
  }

  test("reconstruction error is bounded and far below vector norms") {
    val model = Pq.fit(emb, "embedding", cfg)
    val vecs = emb.limit(100)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].collect()
    val errs = vecs.map { v =>
      val rec = model.decode(model.encode(v.toArray))
      math.sqrt(v.toArray.zip(rec).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    // quantization noise must be well below signal
    assert(errs.max < norms.min, s"max err ${errs.max} vs min norm ${norms.min}")
  }

  test("ADC + exact re-rank recovers exact-NN neighbors (the deployment shape)") {
    val q = emb.orderBy("vec_id").limit(50)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Pq.train(emb, "vec_id", "embedding", cfg)
    val gt = ExactNN.topK(q, emb, 10, ExactNN.L2)

    // raw ADC ranking on 16x-compressed codes of near-random 64-d data:
    // the worst case for PQ — assert the honest floor
    val adcRecall = graft.eval.Eval.setPrecisionRecall(
      idx.searchAll(q, 10), gt).agg(avg("recall")).head().getDouble(0)
    assert(adcRecall >= 0.4, s"raw ADC recall $adcRecall")

    // ADC as candidate generator + exact re-rank of the top-100: the
    // standard pipeline recovers most of the true neighborhood
    val vectors = emb.select($"vec_id", $"embedding")
    val reranked = idx.searchRerank(q, vectors, k = 10, rerankDepth = 100)
    val rerankRecall = graft.eval.Eval.setPrecisionRecall(reranked, gt)
      .agg(avg("recall")).head().getDouble(0)
    assert(rerankRecall >= 0.8, s"reranked recall $rerankRecall")
    assert(rerankRecall > adcRecall)
  }

  /** The encode argmin's early abandon (subDist2Bounded) must be
    * bit-identical to the naive per-subvector argmin, ties included. */
  test("early-abandon encode matches the naive per-subvector argmin exactly") {
    val rnd = new scala.util.Random(321)
    val m = Pq.fit(emb, "embedding", cfg)
    val dims = m.dims; val sub = m.subDim
    (0 until 200).foreach { t =>
      val v = Array.fill(dims)(rnd.nextGaussian())
      val naive = Array.tabulate(m.config.numSubvectors) { s =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        val cb = m.codebooks(s)
        while (c < cb.length) {
          var d2 = 0.0; var i = 0
          while (i < sub) { val d = v(s * sub + i) - cb(c)(i); d2 += d * d; i += 1 }
          if (d2 < bd) { bd = d2; best = c }
          c += 1
        }
        best
      }
      assert(m.encode(v).toSeq === naive.toSeq, s"trial $t")
    }
  }

  test("searchAll refuses a query set beyond MaxQueryBatch with a named error") {
    val idx = Pq.train(emb, "vec_id", "embedding", cfg)
    // the guard must fire BEFORE any unbounded driver-side materialization:
    // the collect is limit()-bounded, so this oversized frame costs
    // MaxQueryBatch+1 tiny rows, not an OOM
    val big = spark.range(Pq.MaxQueryBatch + 1)
      .select($"id".as("query_id"), array(Seq.fill(4)(lit(0.1)): _*).as("qv"))
    val e = intercept[IllegalArgumentException](idx.searchAll(big, 3))
    assert(e.getMessage.contains("small side"), e.getMessage)
  }
}
