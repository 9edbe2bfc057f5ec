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
}
