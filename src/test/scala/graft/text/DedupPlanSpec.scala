package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.text.TextFunctions._

/** Plan-shape guard for the minhash dedup pipeline.
  *
  * The per-row signature chain relies on Catalyst keeping each expensive
  * projection (tokens → shingles → per-shingle md5 hashes → signature)
  * materialized: CollapseProject inlines a lower projection into its
  * consumer unless a non-cheap expression is referenced more than once,
  * and an inlined hash array is re-evaluated once per hash function — a
  * measured 8x per-row md5 blowup (36x wall-clock on the sf0.1 banded
  * stage). These asserts pin the optimized plan, so an optimizer change
  * or a careless builder edit fails here instead of silently burning
  * cluster hours at scale.
  */
class DedupPlanSpec extends AnyFunSuite with SparkSpecBase {

  private val cfg = Dedup.MinHashConfig()

  private lazy val bandedPlan: String = {
    // A real source, not a literal LocalRelation — ConvertToLocalRelation
    // would constant-fold the whole chain and leave nothing to assert on.
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= cfg.shingleN)
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), cfg.shingleN)).as("sh"))
      .select(col("doc_id"), col("sh"),
        transform(col("sh"), s => hash60(0, s) % FpMod).as("hv"))
      .select(col("doc_id"), col("sh"),
        Dedup.minhashSigFromHashes(col("hv"), cfg).as("sig"))
      .select(col("doc_id"), col("sh"),
        explode(Dedup.bandKeysCol(col("sig"), cfg)).as("bk"))
      .queryExecution.optimizedPlan.toString
  }

  test("per-shingle md5 is computed exactly once per row") {
    // hash60's md5(concat(seed, ':', shingle)) must appear in ONE
    // projection; band keys add one md5-of-signature per band.
    val nBands = cfg.numHashes / cfg.bandRows
    val md5s = "md5\\(".r.findAllIn(bandedPlan).length
    assert(md5s === 1 + nBands, s"expected 1 shingle-md5 + $nBands band-key " +
      s"md5s; got $md5s — a projection collapsed:\n$bandedPlan")
  }

  test("tokenization is not inlined into the shingle lambda") {
    // split() may appear in the toks projection and (pushed-down) in the
    // token-count filter — never inside the per-shingle slice, where it
    // would run once per shingle (O(tokens^2) per document).
    val splits = "split\\(".r.findAllIn(bandedPlan).length
    assert(splits <= 2, s"split() appears $splits times — tokenization " +
      s"collapsed into a consumer:\n$bandedPlan")
  }

  test("signature stays a materialized projection below the band generate") {
    // The generator must reference sig as an attribute, not re-derive it
    // per band: no array_min (the signature reduction) inside Generate.
    val generateLine = bandedPlan.linesIterator
      .find(_.contains("Generate")).getOrElse("")
    assert(!generateLine.contains("array_min"),
      s"signature recomputed inside the band generator:\n$generateLine")
    assert(!generateLine.contains("conv("),
      s"shingle hashing recomputed inside the band generator:\n$generateLine")
  }

  test("nearDupAgainstCorpus (ingest path) keeps the chained projections uncollapsed") {
    // The stream-static dedup uses the same chained projection form as
    // the batch path; StreamingDedupSpec proves it value-identical on two
    // batch frames, so pinning the batch-equivalent optimized plan pins
    // the streaming plan's projection shape too. Per side: ONE
    // per-shingle md5 projection + nBands band-key md5s — a collapse on
    // the ingest path would silently reintroduce the 8x md5 blowup on
    // every arriving document.
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val p = Dedup.nearDupAgainstCorpus(docs, "doc_id", "text", docs, cfg)
      .queryExecution.optimizedPlan.toString
    val nBands = cfg.numHashes / cfg.bandRows
    val md5s = "md5\\(".r.findAllIn(p).length
    assert(md5s === 2 * (1 + nBands), s"expected ${2 * (1 + nBands)} md5s " +
      s"(1 shingle-md5 + $nBands band-key md5s per join side); got $md5s:\n$p")
    val splits = "split\\(".r.findAllIn(p).length
    assert(splits <= 4, s"split() appears $splits times (max 2 per side):\n$p")
    p.linesIterator.filter(_.contains("Generate")).foreach { g =>
      assert(!g.contains("array_min"), s"signature recomputed in generator:\n$g")
      assert(!g.contains("conv("), s"hashing recomputed in generator:\n$g")
    }
  }
}
