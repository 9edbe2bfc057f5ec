package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.exprs
import graft.text.TextFunctions._

/** The end-to-end training-data pipeline as ONE oracle-checked query —
  * the composition a training-data user actually runs, chaining stages
  * that are each individually oracle-green elsewhere:
  *
  *   1. exact dedup (keep the lowest doc_id per exact-text key —
  *      `q_exact_dedup`'s key),
  *   2. quality filter (`q_text_quality`'s score, >= [[QualityMin]]),
  *   3. embedding-space near-dup drop (a doc is dropped when a
  *      lower-id quality survivor sits within
  *      [[SimilarityQueries.CosineDupThreshold]] cosine distance —
  *      `q_embedding_near_dup`'s pair set; documents join embeddings on
  *      doc_id = vec_id, the testdata's id alignment),
  *   4. chunk counting (`q_doc_chunks`'s 16/12 sliding-window count),
  *   5. deterministic stratified split (`q_stratified_split`'s
  *      md5-derived 80/20 by language stratum).
  *
  * Output: one row per (lang, split) with surviving doc count, total
  * context-window chunks, and mean quality score. The DuckDB oracle
  * recomputes the whole chain independently, so a drift in ANY stage's
  * semantics (key, score, pair set, chunk arithmetic, split hash)
  * hash-mismatches cross-engine.
  *
  * Scale note: stages 1-2 and 4-5 are map-side or key-shuffled, exactly
  * their standalone forms. Stage 3 here is the quadratic ORACLE BASELINE
  * pair form (deterministic, what DuckDB can recompute); at 100 TB the
  * near-dup stage swaps in the banded/bucketed scale paths already
  * shipped and separately oracle-gated (`Dedup.minhashNearDup`,
  * `LshIndex.candidatePairs` — see `q_minhash_near_dup`,
  * `q_lsh_near_dup_pairs`), which produce candidate subsets verified by
  * the same exact-cosine predicate used here.
  */
object PipelineQueries extends QueryPack {

  /** Quality floor: sf0.01 scores span [1.92, 4.48] (median 3.75), so
    * 3.0 drops a real ~15% tail without emptying any stratum. */
  val QualityMin = 3.0

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_demo" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          tokens(col("text")).as("toks"))

      // S1: exact dedup — keep the lowest doc_id per exact-text key
      val keep = d.groupBy(md5(col("text")).as("tkey"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val deduped = d.join(keep, "doc_id")

      // S2: quality filter (q_text_quality's composite score)
      val stopR = tokenSetRatio(col("toks"), TextQueries.Stopwords)
      val punctR = punctRatio(col("text"))
      val quality = deduped
        .withColumn("quality_score",
          round(log(size(col("toks")).cast(DoubleType) + lit(1.0))
            * (lit(1.0) - stopR) * (lit(1.0) - punctR), 6))
        .where(col("quality_score") >= QualityMin)

      // S3: embedding near-dup drop — greedy lowest-id-wins: a survivor
      // is dropped iff SOME lower-id stage-2 survivor is within the
      // cosine threshold (deterministic, order-free, SQL-mirrorable)
      val se = quality.select(col("doc_id"))
        .join(tbl(s, dir, "embeddings"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("embedding"))
      val dropped = se.as("a")
        .join(se.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
            round(exprs.cosineDistNative(col("a.embedding"), col("b.embedding")), 6)
              <= SimilarityQueries.CosineDupThreshold)
        .select(col("b.doc_id").as("doc_id")).distinct()
      val survivors = quality.join(dropped, Seq("doc_id"), "left_anti")

      // S4: context-window chunk count (q_doc_chunks' 16/12 windows)
      val chunked = survivors.withColumn("n_chunks",
        (((size(col("toks")) - 1) / TextQueries.ChunkStride).cast("int") + 1)
          .cast(LongType))

      // S5: stratified 80/20 split, summarized per (lang, split)
      chunked
        .select(col("lang"),
          when(hash60(0, col("doc_id").cast("string")) % 10 < 8, "train")
            .otherwise("val").as("split"),
          col("quality_score"), col("n_chunks"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chunks").as("n_chunks"),
          round(avg("quality_score"), 4).as("avg_quality"))
        .orderBy("lang", "split")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_pipeline_demo" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, text,
         |         string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id, lang, toks,
         |    round(ln(len(toks)::DOUBLE + 1.0)
         |      * (1.0 - len(list_filter(toks,
         |           t -> t IN ('a', 'the', 'and', 'of', 'to', 'in', 'is')))::DOUBLE
         |           / len(toks))
         |      * (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
         |           / length(text)), 6) AS quality_score,
         |    md5(text) AS tkey
         |  FROM tok
         |),
         |keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY tkey),
         |s2 AS (
         |  SELECT q.* FROM q JOIN keep USING (doc_id)
         |  WHERE quality_score >= $QualityMin
         |),
         |se AS (
         |  SELECT s2.doc_id, e.embedding
         |  FROM s2 JOIN embeddings e ON e.vec_id = s2.doc_id
         |),
         |dropped AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM se a JOIN se b ON a.doc_id < b.doc_id
         |  WHERE round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |        THEN 0.0
         |        ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6)
         |        <= ${SimilarityQueries.CosineDupThreshold}
         |),
         |s4 AS (
         |  SELECT lang, doc_id, quality_score,
         |         ((len(toks) - 1) // ${TextQueries.ChunkStride} + 1)::BIGINT AS n_chunks
         |  FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |)
         |SELECT lang,
         |  CASE WHEN ('0x' || substr(md5('0:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 8
         |       THEN 'train' ELSE 'val' END AS split,
         |  count(*) AS n_docs,
         |  sum(n_chunks)::BIGINT AS n_chunks,
         |  round(avg(quality_score), 4) AS avg_quality
         |FROM s4 GROUP BY lang, split ORDER BY lang, split""".stripMargin
  )
}
