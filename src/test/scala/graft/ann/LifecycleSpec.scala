package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig, LshIndex}

/** Index lifecycle — delete / append / upsert / compaction — on the two
  * serving-index families that store per-vector rows (LSH buckets, IVF
  * cells). The contract under test:
  *
  *   - `withDeletes` is a pure serve-time view: search over the view ==
  *     exact top-k over the corpus MINUS the tombstones (proved with a
  *     single-leaf / all-probe configuration where the candidate set is
  *     total, so index recall cannot mask a leaked tombstone);
  *   - compaction (`withDeletes(t).save`) persists the SAME view: the
  *     reloaded index is row-identical to the tombstoned one;
  *   - `append` hashes/assigns arrivals through the FROZEN model:
  *     arrivals become findable, existing rows are untouched, and the
  *     bucket/cell row count grows by exactly the model's write
  *     amplification (nTrees rows per arrival for LSH, 1 for IVF);
  *   - `upsert` = tombstone-then-append: a re-inserted id appears
  *     exactly once and is served at its NEW embedding.
  */
class LifecycleSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkCorpus(n: Int, seed: Int = 11) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(4)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  private def queriesOf(corpus: org.apache.spark.sql.DataFrame, n: Int) =
    corpus.orderBy("vec_id").limit(n)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  // single leaf per tree -> every query's candidate set is the whole
  // (remaining) corpus, so lifecycle semantics are isolated from recall
  private val lshCfg = LshConfig(nTrees = 3, kMinVecs = 256, seed = 7L)

  test("LSH withDeletes == exact top-k over corpus minus tombstones") {
    val corpus = mkCorpus(20)
    val idx = Lsh.train(corpus, "vec_id", "embedding", lshCfg)
    val q = queriesOf(corpus, 4)
    val dead = Seq(0L, 3L, 8L).toDF("vec_id")
    val res = rows(idx.withDeletes(dead).searchAll(q, 5, 1e9, ExactNN.L2))
    val expected = rows(ExactNN.topK(q,
      corpus.where(!$"vec_id".isin(0L, 3L, 8L)), 5, ExactNN.L2))
    assert(res === expected)
    assert(!res.exists(r => Set(0L, 3L, 8L).contains(r._2)))
  }

  test("LSH compaction persists the tombstoned view identically") {
    val corpus = mkCorpus(20)
    val idx = Lsh.train(corpus, "vec_id", "embedding", lshCfg)
    val dead = Seq(1L, 2L).toDF("vec_id")
    val path = java.nio.file.Files
      .createTempDirectory("lsh_compact").toString
    idx.withDeletes(dead).save(spark, path)
    val reloaded = Lsh.load(spark, path)
    // zero tombstone residue at rest
    assert(reloaded.vectors.where($"vec_id".isin(1L, 2L)).count() === 0)
    assert(reloaded.buckets.where($"vec_id".isin(1L, 2L)).count() === 0)
    val q = queriesOf(corpus, 4)
    assert(rows(reloaded.searchAll(q, 5, 1e9, ExactNN.L2)) ===
      rows(idx.withDeletes(dead).searchAll(q, 5, 1e9, ExactNN.L2)))
  }

  test("LSH append: arrivals hashed through the frozen forest, findable, write-amp exact") {
    val corpus = mkCorpus(16)
    val idx = Lsh.train(corpus, "vec_id", "embedding", lshCfg)
    val arrivals = mkCorpus(24, seed = 23).where($"vec_id" >= 16)
    val grown = idx.append(arrivals)
    assert(grown.buckets.count() ===
      idx.buckets.count() + lshCfg.nTrees * arrivals.count())
    val q = queriesOf(corpus, 4)
    val res = rows(grown.searchAll(q, 5, 1e9, ExactNN.L2))
    val expected = rows(ExactNN.topK(q,
      corpus.unionByName(arrivals), 5, ExactNN.L2))
    assert(res === expected)
  }

  test("LSH upsert: updated id served once, at its new embedding") {
    val corpus = mkCorpus(16)
    val idx = Lsh.train(corpus, "vec_id", "embedding", lshCfg)
    // move vector 5 exactly onto vector 0's location
    val target = corpus.where($"vec_id" === 0L)
      .select(lit(5L).as("vec_id"), $"embedding").cache()
    val up = idx.upsert(target)
    assert(up.vectors.where($"vec_id" === 5L).count() === 1)
    assert(up.buckets.where($"vec_id" === 5L).count() === lshCfg.nTrees)
    val q = corpus.where($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val top = up.searchAll(q, 2, 1e9, ExactNN.L2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(top.keySet === Set(0L, 5L), s"got $top")
    assert(top(5L) === 0.0, "upserted vector must be served at its NEW location")
  }

  // all-probe IVF -> candidate set is the whole remaining corpus
  private val ivfCfg = IvfConfig(nCells = 4, nProbe = 4, iters = 3, seed = 5L)

  test("IVF withDeletes == exact top-k over corpus minus tombstones; upsert serves the new embedding") {
    val corpus = mkCorpus(20)
    val idx = Ivf.train(corpus, "vec_id", "embedding", ivfCfg)
    val q = queriesOf(corpus, 4)
    val dead = Seq(2L, 9L).toDF("vec_id")
    val res = rows(idx.withDeletes(dead).searchAll(q, 5))
    val expected = rows(ExactNN.topK(q,
      corpus.where(!$"vec_id".isin(2L, 9L)), 5, ExactNN.L2))
    assert(res === expected)

    val target = corpus.where($"vec_id" === 0L)
      .select(lit(9L).as("vec_id"), $"embedding").cache()
    val up = idx.upsert(target)
    assert(up.cells.where($"vec_id" === 9L).count() === 1)
    val q0 = corpus.where($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val top = up.searchAll(q0, 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(top.keySet === Set(0L, 9L))
    assert(top(9L) === 0.0)
  }

  test("IVF append assigns arrivals to their nearest frozen centroid; cellStats reads the drift watermark") {
    val corpus = mkCorpus(16)
    val idx = Ivf.train(corpus, "vec_id", "embedding", ivfCfg)
    val arrivals = mkCorpus(24, seed = 41).where($"vec_id" >= 16)
    val grown = idx.append(arrivals)
    assert(grown.cells.count() === idx.cells.count() + arrivals.count())
    // frozen-model contract: appended assignment == model.transform
    val viaModel = idx.model.transform(arrivals, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val stored = grown.cells.where($"vec_id" >= 16L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(stored === viaModel)
    val q = queriesOf(corpus, 4)
    assert(rows(grown.searchAll(q, 5)) ===
      rows(ExactNN.topK(q, corpus.unionByName(arrivals), 5, ExactNN.L2)))
    // the watermark read: occupancy grew, no cell lost rows
    val before = idx.cellStats.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val after = grown.cellStats.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after.values.sum === before.values.sum + arrivals.count())
    assert(before.forall { case (c, n) => after.getOrElse(c, 0L) >= n })
  }
}
