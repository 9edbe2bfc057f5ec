package graft.ann.lsh

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN

/** ScalaCheck properties for the randomized components (SURVEY.md §5):
  * hash determinism, generating-point separation, bit-width bounds,
  * partition invariance of the transform, and topk ⊆ brute-force. */
class ForestPropertiesSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(result.passed, result.status.toString)
  }

  private val dim = 8
  private val vecGen: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))
  private val vecsGen: Gen[List[Array[Double]]] =
    Gen.listOfN(30, vecGen).suchThat(_.map(_.toSeq).distinct.size >= 2)

  test("property: hashing is deterministic and depth-bounded") {
    check(Prop.forAll(vecsGen, Gen.choose(0L, 1000L)) { (vecs, seed) =>
      val tree = Forest.buildTree(vecs, kMinVecs = 2, angular = false, seed)
      vecs.forall { v =>
        val h = Forest.hash(tree, v)
        h == Forest.hash(tree, v) && h >= 0L // stable; depth <= 63 keeps sign bit clear
      }
    })
  }

  test("property: bisector plane separates its two generating points") {
    check(Prop.forAll(vecGen, vecGen) { (p0, p1) =>
      p0.toSeq == p1.toSeq || {
        val plane = Forest.planeByPoints(p0, p1)
        // n = p1 - c points toward p1: p1 on the non-negative side
        !plane.negativeSide(p1) && plane.negativeSide(p0)
      }
    })
  }

  test("property: neighbor hash differs and flips exactly one bit") {
    // full signed range: bit-63 hashes (negative Longs) are reachable
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { h =>
      val n = Forest.neighborHash(h)
      n != h && java.lang.Long.bitCount(h ^ n) == 1
    })
  }

  test("property: for nonzero hashes the flipped bit is the unsigned highest set bit") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue).suchThat(_ != 0L)) { h =>
      val flipped = h ^ Forest.neighborHash(h)
      flipped == java.lang.Long.highestOneBit(h)
    })
  }

  test("property: transform output invariant under repartitioning") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val model = Lsh.fit(emb, "embedding", LshConfig(nTrees = 5, kMinVecs = 30, seed = 21L))
    val base = model.transform(emb, "vec_id", "embedding")
      .orderBy("vec_id", "tree_id").collect().toSeq
    for (n <- Seq(1, 7, 32)) {
      val re = model.transform(emb.repartition(n), "vec_id", "embedding")
        .orderBy("vec_id", "tree_id").collect().toSeq
      assert(re === base, s"differs at $n partitions")
    }
  }

  test("property: LSH results ⊆ brute-force results at the same threshold") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = emb.orderBy("vec_id").limit(30)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val idx = Lsh.train(emb, "vec_id", "embedding",
      LshConfig(nTrees = 8, kMinVecs = 40, seed = 23L))
    val lsh = idx.searchAll(q, k = 1000, distanceThreshold = 1.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ExactNN.topK(q, emb, k = 1000, ExactNN.L2, threshold = Some(1.3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }
}
