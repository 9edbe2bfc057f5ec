package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Column builders for the text-analysis / dedup operators over the
  * `documents` table — the LLM-training-data-pipeline surface layered on
  * top of the reference's vector engine (SURVEY.md §7.5).
  *
  * Everything here is deterministic and built from codegen'd built-ins
  * (no UDFs), so each operator is expressible in ANSI-ish SQL for the
  * DuckDB oracle. The cross-engine hash primitive is md5: both engines
  * produce identical digests, and the first 15/12 hex chars cast to a
  * 60/48-bit non-negative BIGINT — wide enough for MinHash/SimHash, small
  * enough that signed-64 arithmetic never overflows (DuckDB raises on
  * BIGINT overflow while the JVM wraps, so staying < 2^61 is load-bearing
  * for oracle parity).
  *
  * Scale notes (100 TB): every builder is a per-row projection (map-side,
  * whole-stage codegen); the pair-finding operators in
  * [[graft.queries.TextQueries]] shuffle only on shingle/band/signature
  * keys, never all-pairs, except the explicitly-bounded verification
  * joins.
  */
object TextFunctions {

  /** Modulus for the rolling-fingerprint arithmetic (< 2^30 so
    * `acc*131 + x` stays far below 2^63 in both engines). */
  val FpMod = 1000000007L
  val FpMul = 131L

  /** Universal-hash family multipliers/offsets: the k MinHash functions
    * are `(A[i] * h + B[i]) mod FpMod` over ONE md5-derived base hash per
    * shingle — one digest instead of k per shingle (the standard
    * construction). Constants small enough that `A * h` stays far below
    * 2^63 (h < FpMod < 2^30). */
  val HashA = Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  val HashB = Seq(17L, 29L, 43L, 59L, 71L, 83L, 97L, 109L)

  /** Whitespace tokenizer (DuckDB: `string_split_regex(trim(text), '\s+')`). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Seeded 60-bit hash of a string: first 15 hex chars of
    * md5("<seed>:<s>") (DuckDB: `('0x' || substr(md5(...),1,15))::BIGINT`). */
  def hash60(seed: Column, s: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), s)), 1, 15), 16, 10)
      .cast(LongType)

  def hash60(seed: Int, s: Column): Column = hash60(lit(seed), s)

  /** 48-bit variant used for SimHash (12 hex chars) — keeps the
    * per-bit popcount sum and the final Σ 2^b comfortably signed-64. */
  def hash48(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 12), 16, 10)
      .cast(LongType)

  /** Word n-gram shingles: `size-n+1` space-joined windows over the token
    * array; empty when the document is shorter than `n` tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Ratio of tokens that appear in `words` (stopword ratio etc.). */
  def tokenSetRatio(toks: Column, words: Seq[String]): Column = {
    val hit = size(filter(toks, t => t.isin(words.map(lit): _*)))
    hit.cast(DoubleType) / size(toks)
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast(DoubleType) / length(text)

  /** Order-sensitive polynomial rolling hash over the token stream —
    * document fingerprint (reference has no text ops; this is the
    * rolling-hash fingerprint from the LLM-pipeline surface). Matches
    * DuckDB `list_reduce(list_prepend(0, list_transform(toks, t ->
    * hash60 % FpMod)), (a,x) -> (a*131+x) % FpMod)`. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => hash60(0, t) % FpMod),
      lit(0L),
      (acc, x) => (acc * FpMul + x) % FpMod)

  /** Canonical key of the document's token SET (order- and
    * multiplicity-insensitive) — "bag-of-words dedup" key. */
  def tokenSetKey(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Deterministic mixture-sampling keep decision: the per-source keep
    * rate is `rates(sourceIndex % rates.size)` (source name "srcN" →
    * index N) and the uniform draw is md5-derived from doc_id, so the
    * decision is a pure per-row projection. One source of truth for the
    * batch summary (`q_mixture_sample`) and streaming ingest — stateless,
    * so the identical column works under `readStream` unchanged. */
  def mixtureKeep(source: Column, docId: Column, rates: Seq[Double]): Column = {
    val rate = element_at(typedLit(rates),
      (regexp_extract(source, "([0-9]+)$", 1).cast("int") % rates.size) + 1)
    val u = (hash60(1, concat(lit("mix:"), docId.cast("string"))) % 10000)
      .cast(DoubleType) / 10000.0
    u < rate
  }

  /** Per-row (stateless) form of the token-repetition quality stats:
    * struct(unique_ratio, top_tok_frac), the same exact integer ratios
    * the aggregated `q_repetition_quality` chain produces — double
    * division of exact integers, so the flags are bit-identical
    * (asserted stream==batch in StreamingPipelineSpec). HOFs over the
    * token array are O(uniq·n) per document: wrong for the batch corpus
    * pass (the tagged-explode aggregation is linear), right for a
    * streaming ingest filter where explode+groupBy would need shuffle
    * state per micro-batch. */
  def repetitionStats(toks: Column): Column = {
    val uniq = array_distinct(toks)
    val maxTok = array_max(
      transform(uniq, t => size(filter(toks, x => x === t))))
    struct(
      (size(uniq).cast(DoubleType) / size(toks)).as("unique_ratio"),
      (maxTok.cast(DoubleType) / size(toks)).as("top_tok_frac"))
  }
}
