package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.text.TextFunctions._

/** Reusable document-deduplication operators — the library API behind
  * the `q_exact_dedup` / `q_ngram_jaccard_pairs` / `q_minhash_near_dup`
  * driver queries (which pin their own parameters for oracle
  * determinism).
  *
  * Scale knobs the query forms don't expose:
  *
  *   - `maxDocFreqRatio`: drop shingles present in more than this
  *     fraction of documents BEFORE any pair-finding join. Hot shingles
  *     (boilerplate, stopword runs) are the skew that kills shingle-keyed
  *     shuffles at 100 TB — a shingle shared by f docs contributes f^2
  *     join rows, so capping document frequency bounds per-key fan-out
  *     with negligible recall cost (ubiquitous shingles carry no
  *     near-dup signal).
  *   - `numHashes`/`bandRows`: the MinHash S-curve operating point
  *     (P[candidate] = 1-(1-j^r)^b).
  */
object Dedup {

  final case class MinHashConfig(
      shingleN: Int = 3,
      numHashes: Int = 8,
      bandRows: Int = 2,
      jaccardThreshold: Double = 0.5,
      maxDocFreqRatio: Double = 1.0)

  /** (id, text) -> groups of exact duplicates: (dup_key, n_docs, doc_ids).
    * Hash-groupBy on md5 — one shuffle keyed by digest. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("dup_key"))
      .groupBy("dup_key")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list("doc_id")).as("doc_ids"))
      .where(col("n_docs") > 1)

  /** Distinct (doc_id, s) shingle rows, with the document-frequency cap
    * applied (see class doc). */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String,
                   cfg: MinHashConfig): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("toks"), cfg.shingleN))).as("s"))
    if (cfg.maxDocFreqRatio >= 1.0) sh
    else {
      val nDocs = docs.count()
      val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .where(col("df") > cfg.maxDocFreqRatio * nDocs)
        .select("s")
      sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification:
    * (doc_a, doc_b, jac). Shuffles on band keys and shingles only. */
  def minhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    require(cfg.numHashes % cfg.bandRows == 0, "bands must tile the signature")
    require(cfg.numHashes <= HashA.length,
      s"at most ${HashA.length} hash functions available")
    val sh = shingleTable(docs, idCol, textCol, cfg).persist()
    val aArr = array(HashA.take(cfg.numHashes).map(lit): _*)
    val bArr = array(HashB.take(cfg.numHashes).map(lit): _*)
    val sig = sh
      .select(col("doc_id"), (hash60(0, col("s")) % FpMod).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(cfg.numHashes - 1))).as("hash_id"))
      .groupBy("doc_id", "hash_id")
      .agg(min((element_at(aArr, col("hash_id") + 1) * col("h")
        + element_at(bArr, col("hash_id") + 1)) % FpMod).as("sig"))
    val bands = sig
      .withColumn("band", floor(col("hash_id") / cfg.bandRows).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("hash_id"), col("sig")))),
          e => e.getField("sig").cast("string")))).as("bkey"))
      .persist()
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, sh).where(col("jac") >= cfg.jaccardThreshold)
  }

  /** Exact Jaccard for explicit candidate pairs over a shingle table. */
  def verifyJaccard(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sa = sh.join(broadcast(cands), col("doc_id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("s").as("sa_s"))
    val inter = sa
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa_s") === col("sb.s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))).as("jac"))
  }
}
