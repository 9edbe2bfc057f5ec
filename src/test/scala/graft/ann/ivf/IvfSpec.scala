package graft.ann.ivf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** IVF coarse-quantizer index: k-means determinism, cell assignment
  * totality, full-probe == exact recall, and partial-probe recall bound
  * on clustered data (tolerance-banded, reference-style §5 strategy). */
class IvfSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  /** 4 well-separated 2-D clusters of 25 points each (deterministic). */
  private def clustered = {
    val centers = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 25
    } yield {
      val dx = (i % 5) * 0.1; val dy = (i / 5) * 0.1
      ((ci * 25 + i).toLong, Seq(c._1 + dx, c._2 + dy))
    }
    pts.toDF("vec_id", "embedding")
  }

  test("deterministic fit: same seed, same centroids") {
    val a = Ivf.fit(clustered, "embedding", IvfConfig(nCells = 4, seed = 7L))
    val b = Ivf.fit(clustered, "embedding", IvfConfig(nCells = 4, seed = 7L))
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
  }

  test("every vector lands in exactly one cell; 4 clusters -> 4 occupied cells") {
    val idx = Ivf.train(clustered, "vec_id", "embedding",
      IvfConfig(nCells = 4, nProbe = 1, seed = 7L))
    val stats = idx.cellStats.collect()
    assert(stats.map(_.getLong(1)).sum === 100L)
    assert(stats.length === 4)
    // k-means on 4 tight well-separated clusters balances perfectly
    assert(stats.map(_.getLong(1)).toSet === Set(25L))
  }

  test("full probe (nProbe = nCells) reproduces exact NN") {
    val q = clustered.limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Ivf.train(clustered, "vec_id", "embedding",
      IvfConfig(nCells = 4, nProbe = 4, seed = 7L))
    val pred = idx.searchAll(q, k = 5, ExactNN.L2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gt = ExactNN.topK(q, clustered, k = 5, ExactNN.L2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pred === gt)
  }

  test("searchAll topKViaAggregator path is row-identical to the window path") {
    val q = clustered.limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Ivf.train(clustered, "vec_id", "embedding",
      IvfConfig(nCells = 4, nProbe = 4, seed = 7L))
    val window = idx.searchAll(q, k = 5, ExactNN.L2, topKViaAggregator = false)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val agg = idx.searchAll(q, k = 5, ExactNN.L2, topKViaAggregator = true)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(window.nonEmpty)
    assert(agg === window)
  }

  test("nProbe=1 on separated clusters still achieves full recall (cluster-local NNs)") {
    val q = clustered.limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Ivf.train(clustered, "vec_id", "embedding",
      IvfConfig(nCells = 4, nProbe = 1, seed = 7L))
    val pred = idx.searchAll(q, k = 5, ExactNN.L2)
    val gt = ExactNN.topK(q, clustered, k = 5, ExactNN.L2)
    val recall = graft.eval.Eval.setPrecisionRecall(pred, gt)
      .agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.99, s"recall $recall")
  }

  test("testdata embeddings: nProbe=8/16 recall above 0.8") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = emb.orderBy("vec_id").limit(50)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Ivf.train(emb, "vec_id", "embedding",
      IvfConfig(nCells = 16, nProbe = 8, seed = 42L))
    val pred = idx.searchAll(q, k = 10, ExactNN.L2)
    val gt = ExactNN.topK(q, emb, k = 10, ExactNN.L2)
    val recall = graft.eval.Eval.setPrecisionRecall(pred, gt)
      .agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.8, s"recall $recall")
  }
}
