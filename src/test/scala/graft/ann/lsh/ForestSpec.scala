package graft.ann.lsh

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.lsh.Forest._

/** Geometry/hashing unit tests mirroring the reference's fixtures
  * (FIXTURES.md §1; reference lsh/lsh_test.go:15-44). */
class ForestSpec extends AnyFunSuite {

  test("plane product sign (reference TestPlane, lsh_test.go:15-28)") {
    val p = Plane(Array(1.5, -1.0), 2.0)
    assert(p.negativeSide(Array(0.0, 0.0))) // 0 - 2 < 0
    assert(!p.negativeSide(Array(4.0, 0.0))) // 6 - 2 > 0
  }

  test("two-point tree yields hashes 1 and 0 (reference TestGetHash)") {
    val vecs = Seq(Array(-1.0, -1.0), Array(2.0, -1.0))
    val tree = buildTree(vecs, kMinVecs = 2, angular = false, seed = 7L)
    assert(hash(tree, vecs(0)) === 1L)
    assert(hash(tree, vecs(1)) === 0L)
  }

  test("bisector plane geometry") {
    // p0=[-1,-1] (smaller norm), p1=[2,-1]: c=[0.5,-1], n=[1.5,0], d=0.75
    val p = planeByPoints(Array(-1.0, -1.0), Array(2.0, -1.0))
    assert(p.normal.toSeq === Seq(1.5, 0.0))
    assert(p.offset === 0.75)
    // equidistant points land on the non-negative side (sign >= 0 -> right)
    assert(!p.negativeSide(Array(0.5, -1.0)))
  }

  test("deterministic build: same seed, same forest hashes") {
    val rng = new scala.util.Random(123)
    val vecs = Seq.fill(50)(Array.fill(8)(rng.nextGaussian()))
    val t1 = buildTree(vecs, 2, angular = false, seed = 42L)
    val t2 = buildTree(vecs, 2, angular = false, seed = 42L)
    vecs.foreach(v => assert(hash(t1, v) === hash(t2, v)))
  }

  test("depth never exceeds 63 bits even with degenerate duplicates") {
    // all-identical vectors: every split sends everything to one side and
    // child size stays > kMinVecs -> recursion must stop on depth, and
    // with <2 distinct points the plane is degenerate (n=0 -> side sign of
    // -d) — just assert we terminate and produce a valid hash
    val vecs = Seq.fill(10)(Array(1.0, 1.0))
    val tree = buildTree(vecs, kMinVecs = 1, angular = false, seed = 1L)
    val h = hash(tree, Array(1.0, 1.0))
    assert(h >= 0L || h < 0L) // terminated; any Long is fine
  }

  test("neighbor hash flips highest set bit; bit 0 for zero") {
    assert(neighborHash(0L) === 1L)
    assert(neighborHash(1L) === 0L)
    assert(neighborHash(5L) === 1L) // 101b -> flip bit 2 -> 001b
    assert(neighborHash(6L) === 2L) // 110b -> flip bit 2 -> 010b
  }

  test("neighbor hash flips the true highest bit when bit 63 is set") {
    // a depth-64 path can set bit 63, making the hash negative as a
    // signed Long; the unsigned highest set bit must still be the flip
    // target (reference semantics are uint64 floor(log2), lsh.go:146-151)
    assert(neighborHash(Long.MinValue) === 0L) // only bit 63 set
    assert(neighborHash(Long.MinValue | 5L) === 5L)
    assert(neighborHash(-1L) === Long.MaxValue) // all 64 bits set
  }

  test("sampleCap sizing rule: expected occupancy tracks the corpus/sample ratio") {
    // The corpus >> fit-sample regime (measured at GloVe scale,
    // SCALE.md): kMinVecs bounds leaf size only over the sample, so a
    // corpus c x the sample inflates bucket occupancy — and search
    // cost — by c. The rule: keep total/sampleCap under ~3, or bound
    // downstream work with cappedBuckets/maxCandidates. fit() logs a
    // warning past that threshold (Lsh.scala).
    val cfg = LshConfig(kMinVecs = 50, sampleCap = 100000)
    assert(cfg.fitSampleSize(40000L) === 40000L) // uncapped: sample = corpus
    assert(cfg.expectedOccupancy(40000L) === 50.0) // occupancy = kMinVecs
    assert(cfg.fitSampleSize(1200000L) === 100000L) // capped at sampleCap
    assert(cfg.expectedOccupancy(1200000L) === 600.0) // 12x corpus -> 12x kMinVecs
    // the GloVe case: 1.18M vecs over a 100k cap = 11.8x -> warn regime
    assert(cfg.expectedOccupancy(1200000L) / cfg.kMinVecs > 3.0)
  }

  test("angular build normalizes sampled points (cluster split is scale-invariant)") {
    // two directions, different magnitudes; angular trees must split by
    // direction, so scaled copies hash together
    val a1 = Array(1.0, 0.0); val a2 = Array(10.0, 0.0)
    val b1 = Array(0.0, 1.0); val b2 = Array(0.0, 20.0)
    val tree = buildTree(Seq(a1, a2, b1, b2), kMinVecs = 1, angular = true, seed = 3L)
    val m = new LshModel(LshConfig(nTrees = 1, kMinVecs = 1, angular = true), Array(tree))
    assert(m.hashes(a1).head === m.hashes(a2).head)
    assert(m.hashes(b1).head === m.hashes(b2).head)
    assert(m.hashes(a1).head !== m.hashes(b1).head)
  }
}
