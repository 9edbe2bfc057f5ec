package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** NN-Descent refinement.
  *
  * Convergence is tested on a CLUSTERED corpus (50 centers × 10 points,
  * low intrinsic dimension) — the regime the algorithm is for; from a
  * random seed the measured curve is 0.01 → 0.67 → 0.92 → 0.98 → 0.99
  * over four rounds, the paper's own shape. On the
  * near-iid 64-d testdata background the same refinement barely moves
  * (measured ~0.01→0.08 over 6 rounds) — Dong et al.'s own documented
  * high-intrinsic-dimension failure mode (WWW 2011 §5.4), which is why
  * the driver query grades the lift cross-engine instead of assuming it.
  * The invariants (per-node kth distance monotone, degree bound,
  * determinism, no-Window plan) hold on any corpus and are tested on the
  * real testdata.
  */
class NnDescentSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val k = 5

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  /** 50 tight clusters in 64-d — intrinsic dimension is low; the
    * neighbor-of-neighbor principle actually holds. Deterministic seed. */
  private def clustered: DataFrame = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(50)(Array.fill(64)(rnd.nextGaussian()))
    (0 until 500).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** The paper's seed: k pseudo-random neighbors per node (hash-derived,
    * deterministic). Random init matters — a LOCAL seed like a ring has
    * co-neighbor expansion that only doubles its radius per round
    * (diameter n/k rounds to mix), which we measured stalling exactly as
    * the structure predicts. */
  private def randomInit(e: DataFrame): DataFrame = {
    val ids = e.select($"vec_id").as[Long].collect().sorted
    val n = ids.length
    val edges = ids.flatMap { id =>
      Iterator.from(0)
        .map(j => ids(math.abs((id.toString + "#" + j).hashCode) % n))
        .filter(_ != id).distinct.take(k).map(d => (id, d))
    }
    val vecs = e.select($"vec_id", $"embedding")
    edges.toSeq.toDF("src", "dst")
      .join(vecs.select($"vec_id".as("src"), $"embedding".as("va")), "src")
      .join(vecs.select($"vec_id".as("dst"), $"embedding".as("vb")), "dst")
      .select($"src", $"dst",
        round(ExactNN.Cosine.dist($"va", $"vb"), 6).as("dist"))
  }

  private def recallVs(g: DataFrame, gt: DataFrame): Double =
    graft.eval.Eval.setPrecisionRecall(
        g.select($"src".as("query_id"), $"dst".as("vec_id")),
        gt.select($"src".as("query_id"), $"dst".as("vec_id")))
      .agg(avg("recall")).as[Double].head()

  test("converges to the exact graph from a geometry-free seed on clustered data") {
    val e = clustered
    val gt = KnnGraph.exact(e, "vec_id", "embedding", k, ExactNN.Cosine)
    val init = randomInit(e)
    val r0 = recallVs(init, gt)
    val r4 = recallVs(
      NnDescent.refine(init, e, "vec_id", "embedding", k,
        ExactNN.Cosine, iterations = 4), gt)
    assert(r0 < 0.1, s"random seed should start near zero recall, got $r0")
    assert(r4 > 0.97, s"four rounds should near-reach the exact graph, got $r4")
  }

  test("per-node kth distance is monotone non-increasing across refinement") {
    val e = emb
    val init = randomInit(e)
    val ref = NnDescent.refine(init, e, "vec_id", "embedding", k,
      ExactNN.Cosine, iterations = 2)
    def kth(g: DataFrame) = g.groupBy("src").agg(max("dist").as("kd"))
    val joined = kth(init).withColumnRenamed("kd", "kd0")
      .join(kth(ref).withColumnRenamed("kd", "kd1"), "src")
    val worsened = joined.where($"kd1" > $"kd0").count()
    assert(worsened === 0L, "refinement worsened some node's kth distance")
  }

  test("refinement is deterministic and keeps the per-node degree bound") {
    val e = emb
    val init = randomInit(e)
    def run() = NnDescent.refine(init, e, "vec_id", "embedding", k,
        ExactNN.Cosine, iterations = 2)
      .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._3, t._2))
    val a = run()
    assert(a.toSeq === run().toSeq, "two identical runs disagreed")
    val degrees = a.groupBy(_._1).map(_._2.length).toSet
    assert(degrees === Set(k), s"per-node degree bound violated: $degrees")
  }

  test("never loses recall when refining the LSH graph on real testdata") {
    val e = emb
    val gt = KnnGraph.exact(e, "vec_id", "embedding", k, ExactNN.Cosine)
    val idx = graft.ann.lsh.Lsh.train(e, "vec_id", "embedding",
      graft.ann.lsh.LshConfig(nTrees = 4, kMinVecs = 50, angular = true,
        seed = 42L))
    val init = KnnGraph.fromLsh(idx, e, "vec_id", "embedding", k,
      ExactNN.Cosine, maxBucketOccupancy = 200)
    val r0 = recallVs(init, gt)
    val r1 = recallVs(
      NnDescent.refine(init, e, "vec_id", "embedding", k,
        ExactNN.Cosine, iterations = 2), gt)
    assert(r1 >= r0, s"refinement lost recall: $r0 -> $r1")
  }

  test("refinement plan uses the bounded TopK tail (no Window)") {
    val e = emb
    val p = NnDescent.refine(randomInit(e), e, "vec_id", "embedding", 3,
        ExactNN.Cosine, iterations = 1)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Window"), s"window in NN-Descent plan:\n$p")
  }
}
