package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Dedup library API: exact groups, planted near-dup detection, and the
  * document-frequency cap's effect on hot shingles. */
class DedupSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val nearDup = base.replace("theta", "thetaX") // one token changed
  private val docs = Seq(
    (0L, base),
    (1L, base),            // exact dup of 0
    (2L, nearDup),         // near dup of 0/1
    (3L, "completely different words here nothing shared with others at all"),
    (4L, "unrelated content again still nothing in common whatsoever today"))
    .toDF("doc_id", "text")

  test("exactGroups finds only the exact duplicate pair") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 1)
    assert(g.head.getAs[Seq[Long]]("doc_ids") === Seq(0L, 1L))
  }

  test("minhashNearDup finds planted near-dups and nothing else") {
    val pairs = Dedup.minhashNearDup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical -> jac 1.0
    // near-dup pair(s) with 0/1 allowed; nothing involving 3 or 4
    assert(pairs.forall { case (a, b) => a <= 2 && b <= 2 })
    assert(pairs.nonEmpty)
  }

  test("banded simhashNearDup == quadratic verifier on testdata docs") {
    val docs01 = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val banded = Dedup.simhashNearDup(docs01, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.simhash48(docs01, "doc_id", "text")
    val quad = sh.as("a").join(sh.as("b"),
        org.apache.spark.sql.functions.col("a.doc_id") <
          org.apache.spark.sql.functions.col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "cast(bit_count(a.simhash ^ b.simhash) AS bigint) AS ham")
      .where("ham <= 8")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // pigeonhole banding is exact for hamming <= maxHamming: no misses
    assert(banded === quad)
    assert(banded.nonEmpty)
  }

  test("minhashSigCol (stateless per-row form) equals the exploded signature stage") {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions._
    val cfg = Dedup.MinHashConfig()
    val docs01 = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    // exploded construction — the minhashNearDup internal stage
    val aArr = array(HashA.take(cfg.numHashes).map(lit): _*)
    val bArr = array(HashB.take(cfg.numHashes).map(lit): _*)
    val exploded = Dedup.shingleTable(docs01, "doc_id", "text", cfg)
      .select(col("doc_id"), (hash60(0, col("s")) % FpMod).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(cfg.numHashes - 1))).as("hash_id"))
      .groupBy("doc_id", "hash_id")
      .agg(min((element_at(aArr, col("hash_id") + 1) * col("h")
        + element_at(bArr, col("hash_id") + 1)) % FpMod).as("sig"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("hash_id"), col("sig")))),
        e => e.getField("sig")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val perRow = docs01
      .select(col("doc_id"),
        Dedup.minhashSigCol(tokens(col("text")), cfg).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(perRow.keySet === exploded.keySet)
    perRow.foreach { case (id, s) => assert(s === exploded(id), s"doc $id") }
  }

  test("connectedComponents: min-label clusters over a pair graph") {
    // components: {1,2,3,4} (a 3-deep chain), {7,8}, {10,11,12} (triangle)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (7L, 8L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // retention filter: exactly one kept doc per component
    assert(cc.count { case (d, c) => d == c } === 3)
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 13)
    assert(cc.values.forall(_ == 0L))
  }

  test("connectedComponents pointer jump: deep chain converges within the doubling bound") {
    // a 40-deep chain needs ~40 plain min-propagation rounds; with the
    // round-2+ label(label(v)) jump, covered distance follows
    // d <- 2d + 1 (1, 3, 7, 15, 31, 63...), so round 6 covers the
    // whole chain and round 7 confirms — maxIters = 8 would leave the
    // plain loop visibly unconverged and pins the doubling behavior
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(chain, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 41)
    assert(cc.values.forall(_ == 0L))
  }

  test("connectedComponents pointer jump: labels identical to brute-force components") {
    // randomized pair graph (fixed seed) — the converged labeling must
    // be exactly min-id-of-component, the same contract the plain loop
    // served; brute force via union-find in the test
    val rnd = new scala.util.Random(42L)
    val pairs = (0 until 120).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter { case (a, b) => a != b }
    val parent = Array.tabulate(60)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => d -> {
        // min id within d's component, over ids that appear in pairs
        val root = find(d.toInt)
        pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .filter(o => find(o.toInt) == root).min
      }).toMap
    val cc = Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === expected)
  }

  test("maxDocFreqRatio drops ubiquitous shingles") {
    // every doc shares the same leading 3 tokens -> that shingle is hot
    val shared = Seq(
      (0L, "common prefix here alpha beta gamma"),
      (1L, "common prefix here delta epsilon zeta"),
      (2L, "common prefix here eta theta iota"),
      (3L, "common prefix here kappa lambda mu")).toDF("doc_id", "text")
    val uncapped = Dedup.shingleTable(shared, "doc_id", "text",
      Dedup.MinHashConfig()).collect()
    val capped = Dedup.shingleTable(shared, "doc_id", "text",
      Dedup.MinHashConfig(maxDocFreqRatio = 0.5)).collect()
    assert(uncapped.count(_.getAs[String]("s") == "common prefix here") === 4)
    assert(capped.count(_.getAs[String]("s") == "common prefix here") === 0)
    assert(capped.nonEmpty)
  }

  test("capped minhash drops boilerplate-only docs instead of banding them on empty signatures") {
    import org.apache.spark.sql.functions._
    // 8 docs that are NOTHING BUT the shared boilerplate: at ratio 0.5
    // every one of their shingles is hot, so the row-level cap must drop
    // the docs entirely. Letting them through with an empty shingle
    // array would give each an all-NULL signature and therefore the
    // SAME md5('') band key in every band — a quadratic candidate
    // self-join over exactly the skew the cap exists to remove (and a
    // 0/0 Jaccard under ANSI mode).
    val bp = "subscribe to our newsletter for all the latest updates today friends"
    val corpus = ((0L until 8L).map(i => (i, bp)) ++ Seq(
      (100L, base), (101L, base), // planted exact pair, jac 1.0
      (102L, "totally different tokens nothing shared with anything else at all")))
      .toDF("doc_id", "text")
    val cfg = Dedup.MinHashConfig(maxDocFreqRatio = 0.5)
    val capped = Dedup.cappedShingleArrays(corpus, "doc_id", "text", cfg)
    assert(capped.where(size(col("sh")) === 0).count() === 0)
    val kept = capped.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(100L, 101L, 102L)) // all boilerplate-only docs gone
    val pairs = Dedup.minhashNearDup(corpus, "doc_id", "text", cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
  }
}
