package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.lsh.{Lsh, LshConfig}

/** k-NN graph: exact graph pinned against a JVM brute-force computation,
  * per-node edge-count bound, mutual-flag correctness, LSH-graph subset +
  * recall properties, plan shape (no Window in the bounded tail). */
class KnnGraphSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def jvmCosine(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    val d = 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    val clamped = if (d < 1e-6) 0.0 else d
    BigDecimal(clamped).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("exact graph matches a JVM brute-force k-NN graph") {
    val k = 4
    val g = KnnGraph.exact(emb, "vec_id", "embedding", k, ExactNN.Cosine)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2)).map(e => (e._2, e._3)).toSeq).toMap
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    assert(g.size === vecs.length)
    // spot-check 25 nodes against the brute-force ranking
    vecs.take(25).foreach { case (id, v) =>
      val expect = vecs.filter(_._1 != id)
        .map { case (oid, ov) => (oid, jvmCosine(v, ov)) }
        .sortBy { case (oid, d) => (d, oid) }
        .take(k).toSeq
      assert(g(id) === expect, s"neighbors of node $id")
    }
  }

  test("each node has exactly k edges when corpus > k") {
    val g = KnnGraph.exact(emb, "vec_id", "embedding", 3, ExactNN.Cosine)
    val counts = g.groupBy("src").count().select("count").distinct()
      .as[Long].collect()
    assert(counts.toSeq === Seq(3L))
  }

  test("mutual flag marks exactly the edges whose reverse edge exists") {
    val g = KnnGraph.exact(emb, "vec_id", "embedding", 4, ExactNN.Cosine)
    val edges = g.select("src", "dst").as[(Long, Long)].collect().toSet
    val got = KnnGraph.withMutual(g)
      .select("src", "dst", "mutual").as[(Long, Long, Boolean)].collect()
    assert(got.length === edges.size)
    got.foreach { case (s, d, m) =>
      assert(m === edges.contains((d, s)), s"mutual($s,$d)")
    }
    // sanity: a nearest-neighbor relation is not symmetric in general —
    // both flavors should exist on real data
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("LSH graph: edges carry exact distances and recall is high on the planted corpus") {
    val k = 5
    val idx = Lsh.train(emb, "vec_id", "embedding",
      LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
    val pred = KnnGraph.fromLsh(idx, emb, "vec_id", "embedding", k,
      ExactNN.Cosine, maxBucketOccupancy = 200)
    val gt = KnnGraph.exact(emb, "vec_id", "embedding", k, ExactNN.Cosine)
    // every predicted edge's distance must equal the exact cosine (the
    // LSH path approximates the candidate SET, never the distance)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    pred.as[(Long, Long, Double)].collect().foreach { case (s, d, dist) =>
      assert(dist === jvmCosine(vecs(s), vecs(d)), s"edge ($s,$d)")
    }
    val recall = graft.eval.Eval.setPrecisionRecall(
        pred.select($"src".as("query_id"), $"dst".as("vec_id")),
        gt.select($"src".as("query_id"), $"dst".as("vec_id")))
      .agg(avg("recall")).as[Double].head()
    assert(recall >= 0.8, s"LSH graph recall $recall below expected band")
  }

  test("graph construction plans use the bounded TopK tail (no Window)") {
    val p1 = KnnGraph.exact(emb, "vec_id", "embedding", 3, ExactNN.Cosine)
      .queryExecution.optimizedPlan.toString
    assert(!p1.contains("Window"), s"window in exact graph plan:\n$p1")
    val idx = Lsh.train(emb, "vec_id", "embedding",
      LshConfig(nTrees = 4, kMinVecs = 50, angular = true, seed = 42L))
    val p2 = KnnGraph.fromLsh(idx, emb, "vec_id", "embedding", 3, ExactNN.Cosine)
      .queryExecution.optimizedPlan.toString
    assert(!p2.contains("Window"), s"window in LSH graph plan:\n$p2")
  }
}
