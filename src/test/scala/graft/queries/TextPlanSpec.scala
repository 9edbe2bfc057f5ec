package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Plan-shape guards for the HOF-heavy text queries, extending the
  * DedupPlanSpec treatment (see its scaladoc for the CollapseProject
  * failure mode: an inlined projection re-evaluates its expression once
  * per consumer reference — for md5-per-shingle chains a measured 8x
  * per-row blowup, for tokenization-inside-a-per-shingle-lambda an
  * O(tokens^2) one). Each test pins the occurrence count of the
  * expensive primitives (md5, split) in the OPTIMIZED plan of the real
  * driver query, so an optimizer upgrade or a careless edit fails here
  * instead of silently burning cluster hours at scale.
  */
class TextPlanSpec extends AnyFunSuite with SparkSpecBase {

  private def plan(name: String): String =
    TextQueries.queries(name)(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan.toString

  private def count(re: String, p: String): Int = re.r.findAllIn(p).length

  test("q_minhash_signatures: one shingle md5; signature materialized below posexplode") {
    val p = plan("q_minhash_signatures")
    assert(count("md5\\(", p) === 1, p)
    assert(count("split\\(", p) <= 2, p)
    val gen = p.linesIterator.find(_.contains("Generate")).getOrElse("")
    assert(!gen.contains("array_min"), s"sig recomputed in generator:\n$gen")
    assert(!gen.contains("conv("), s"hashing recomputed in generator:\n$gen")
    assert(!p.contains("Aggregate"), "per-row form needs no aggregation")
  }

  test("q_simhash: one shingle md5; tokenization not inlined per shingle") {
    val p = plan("q_simhash")
    assert(count("md5\\(", p) === 1, p)
    assert(count("split\\(", p) <= 2, p)
  }

  test("q_doc_chunks: one chunk-hash md5; tokenization not inlined into the chunk lambda") {
    val p = plan("q_doc_chunks")
    assert(count("md5\\(", p) === 1, p)
    assert(count("split\\(", p) <= 2, p)
  }

  test("q_doc_fingerprint: md5 only inside the per-token transform") {
    val p = plan("q_doc_fingerprint")
    assert(count("md5\\(", p) === 1, p)
    assert(count("split\\(", p) <= 2, p)
  }

  test("q_repetition_quality: one corpus scan, zero joins") {
    val p = plan("q_repetition_quality")
    assert(count("parquet", p) === 1, s"corpus scanned more than once:\n$p")
    assert(!p.contains("Join"), s"join crept into the single-pass form:\n$p")
    // 2: the pushed-down size filter re-evaluates split once per row
    // (same shape the md5 pins above allow); the explode lambda itself
    // must not re-tokenize.
    assert(count("split\\(", p) <= 2, s"tokenization inlined per element:\n$p")
  }

  test("q_mixture_sample: scan-side sampling, one aggregate, no join") {
    val p = plan("q_mixture_sample")
    assert(count("parquet", p) === 1, p)
    assert(!p.contains("Join"), p)
    assert(count("Aggregate", p) === 1,
      s"sampling must fold into the scan-side projection:\n$p")
  }

  test("q_context_pack: running sum is partitioned by source, never global") {
    val p = plan("q_context_pack")
    assert(p.contains("windowspecdefinition(source"),
      s"window lost its source partitioning (global single-partition sort):\n$p")
  }

  test("q_pii_redact: redaction chain evaluated once per row, pure scan-side") {
    val p = plan("q_pii_redact")
    // 2 regexp_replace calls total (email pass + lexicon pass); an
    // inlined `redacted` alias would show 4 (length + fingerprint each
    // re-running the chain).
    assert(count("regexp_replace\\(", p) === 2,
      s"redaction chain re-evaluated per consumer:\n$p")
    assert(!p.contains("Join") && !p.contains("Aggregate"),
      s"scrub must stay a scan-side projection:\n$p")
  }

  test("q_dsir_weights: vocab and totals join as broadcasts, never shuffled joins") {
    val p = TextQueries.queries("q_dsir_weights")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"vocab join must broadcast onto the token stream:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab broadcast join missing:\n$p")
  }

  test("q_dup_span_coverage: covered-position explode amplifies only duplicated spans") {
    val p = plan("q_dup_span_coverage")
    // The sequence(pos, pos+N-1) generator must sit ABOVE the dup-hash
    // join (explode duplicated starts only), never on the full span
    // stream — at 100 TB the dup set is a small fraction of all spans.
    val lines = p.linesIterator.toVector
    val genIdx = lines.indexWhere(_.contains("explode(sequence"))
    val dupJoinIdx = lines.indexWhere(_.contains("Join Inner"))
    assert(genIdx >= 0, s"covered-position generator missing:\n$p")
    assert(dupJoinIdx >= 0, s"dup-hash inner join missing:\n$p")
    assert(genIdx < dupJoinIdx,
      s"position explode must consume the dup-join output (sit above it):\n$p")
  }

  test("q_unigram_ppl: vocab and total join as broadcasts, never shuffled joins") {
    val p = TextQueries.queries("q_unigram_ppl")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"vocab join must broadcast onto the token stream:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab broadcast join missing:\n$p")
  }
}
