package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Incremental near-dup maintenance: stored band index + arrivals-only
  * work must equal the full recompute — both at the pair level
  * (stored ∪ incremental == minhashNearDup(union)) and at the cluster
  * level (star-collapsed merge == CC over all pairs). */
class IncrementalDedupSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  // bandRows = 1: eight single-row bands make the banding lottery
  // near-exhaustive at jac >= 0.3 (hit prob 1-(1-j)^8 > 0.94), so the
  // staged bridge/twin pairs are found deterministically in practice;
  // extra candidates are harmless (exact-verified)
  private val cfg = Dedup.MinHashConfig(shingleN = 3, numHashes = 8,
    bandRows = 1, jaccardThreshold = 0.3, maxDocFreqRatio = 1.0)

  private def words(seed: Int, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)("w" + rng.nextInt(500))
  }

  // base: 40 docs, pairs (i, i+1) planted for i % 10 == 0 by twinning
  private def baseDocs = (0 until 40).map { i =>
    val toks =
      if (i % 10 == 1) words(i - 1, 15).updated(7, "changed")
      else words(i, 15)
    (i.toLong, toks.mkString(" "))
  }.toDF("doc_id", "text")

  // arrivals: 41 twins doc 20; 42 twins 43; 44 bridges clusters of 0
  // and 10 (half of each text)
  private def arrivals = Seq(
    (41L, words(20, 15).updated(3, "x").mkString(" ")),
    (42L, words(1000, 15).mkString(" ")),
    (43L, words(1000, 15).updated(9, "y").mkString(" ")),
    (44L, (words(0, 15) ++ words(10, 15)).mkString(" ")),
    (45L, words(2000, 15).mkString(" "))).toDF("doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet

  test("stored ∪ incremental pairs == full recompute on the union") {
    val union = baseDocs.unionByName(arrivals)
    val full = pairSet(Dedup.minhashNearDup(union, "doc_id", "text", cfg))
    val stored = pairSet(Dedup.minhashNearDup(baseDocs, "doc_id", "text", cfg))
    val baseBands = Dedup.bandRows(
      Dedup.rawShingleArrays(baseDocs, "doc_id", "text", cfg), cfg)
    val inc = pairSet(Dedup.minhashNearDupIncremental(
      baseBands, arrivals, "doc_id", "text", cfg))
    assert(inc.nonEmpty)
    // arrivals-only work: every incremental pair touches an arrival
    assert(inc.forall(p => p._1 >= 41 || p._2 >= 41))
    assert(stored ++ inc === full)
    // the scenario exercises what it claims: a bridge pair exists
    assert(inc.exists(p => p._2 === 44L))
  }

  test("star-collapsed cluster merge == CC over all pairs of the union") {
    val union = baseDocs.unionByName(arrivals)
    val fullPairs = Dedup.minhashNearDup(union, "doc_id", "text", cfg)
    val fullCC = Dedup.connectedComponents(fullPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    val basePairs = Dedup.minhashNearDup(baseDocs, "doc_id", "text", cfg)
    val oldAssign = Dedup.connectedComponents(basePairs)
    val baseBands = Dedup.bandRows(
      Dedup.rawShingleArrays(baseDocs, "doc_id", "text", cfg), cfg)
    val incPairs = Dedup.minhashNearDupIncremental(
      baseBands, arrivals, "doc_id", "text", cfg)
    val merged = Dedup.mergeClusters(oldAssign, incPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(merged === fullCC)
    // doc 44 bridged the clusters of 0 and 10: all five share label 0
    assert(Seq(0L, 1L, 10L, 11L, 44L).forall(d => fullCC.get(d).contains(0L)),
      s"bridge scenario not exercised: $fullCC")
  }

  test("frozen hot list caps arrival shingles like the base's own cap") {
    // boilerplate sentence in 60% of base docs -> hot at ratio 0.1
    val cfgCap = cfg.copy(maxDocFreqRatio = 0.1)
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val base2 = (0 until 40).map { i =>
      val t = words(i + 300, 12).mkString(" ")
      (i.toLong, if (i % 5 != 0) s"$boiler $t" else t)
    }.toDF("doc_id", "text")
    val hot = Dedup.hotShingleRow(base2, "doc_id", "text", cfgCap)
    assert(hot.head().getSeq[String](0).nonEmpty)
    // two arrivals sharing ONLY the boilerplate: with the frozen hot
    // list their overlap is capped away, so no pair survives
    val arr2 = Seq(
      (100L, s"$boiler ${words(901, 12).mkString(" ")}"),
      (101L, s"$boiler ${words(902, 12).mkString(" ")}")).toDF("doc_id", "text")
    val baseBands2 = Dedup.bandRows(
      Dedup.cappedShingleArrays(base2, "doc_id", "text", cfgCap), cfgCap)
    val inc = Dedup.minhashNearDupIncremental(
      baseBands2, arr2, "doc_id", "text", cfgCap, hot = Some(hot))
    assert(!pairSet(inc).exists(p => p._1 === 100L && p._2 === 101L),
      "boilerplate-only overlap must be capped away by the frozen hot list")
  }
}
