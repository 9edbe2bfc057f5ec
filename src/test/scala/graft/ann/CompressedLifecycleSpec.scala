package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.bq.Bq
import graft.ann.ivfpq.{IvfPq, IvfPqConfig}
import graft.ann.ivfsq.{IvfSq, IvfSqConfig}
import graft.ann.pq.{Pq, PqConfig}
import graft.ann.sq.Sq

/** Lifecycle (delete / append / upsert) across the six compressed
  * code-table families — SQ, BQ, PQ, OPQ, IVF-SQ, IVF-PQ. The uniform
  * contract (each family stores one codes DataFrame keyed by vec_id,
  * each model encodes map-side with frozen parameters):
  *
  *   - `withDeletes` removes exactly the tombstoned code rows;
  *   - `append` grows the table by exactly the arrivals, and every
  *     appended row is byte-identical to the frozen model's transform
  *     of that arrival (no refit sneaks in);
  *   - `upsert` leaves the updated id with exactly one code row — the
  *     one encoding its NEW embedding.
  *
  * End-to-end serving under deletes is additionally pinned on the two
  * family poles (SQ: plain scan; IVF-PQ: two frozen quantizers +
  * cell-pruned ADC): with rerank depth ≥ corpus and all cells probed,
  * searchRerank over the tombstoned view == exact top-k over the live
  * corpus.
  */
class CompressedLifecycleSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkCorpus(n: Int, seed: Int = 13) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  private val corpus = mkCorpus(30).cache()
  private val arrivals = mkCorpus(40, seed = 29).where($"vec_id" >= 30).cache()
  private val dead = Seq(1L, 4L, 9L)
  private val deadDf = dead.toDF("vec_id")
  // update: move id 9 onto id 0's embedding
  private val newEmb = corpus.where($"vec_id" === 0L)
    .select($"embedding").as[Seq[Double]].head()
  private val updates = Seq(9L -> newEmb).toDF("vec_id", "embedding")

  private def codeRows(codes: DataFrame): Map[Long, String] =
    codes.collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.toSeq.zip(r.schema.fieldNames).filterNot(_._2 == "vec_id")
          .map(_._1).mkString("|"))
    }.toMap

  /** The uniform family check over (codes, withDeletes, append, upsert,
    * transform-of). */
  private def checkFamily(name: String, codes: DataFrame,
                          afterDel: DataFrame, afterApp: DataFrame,
                          afterUp: DataFrame,
                          transformOf: DataFrame => DataFrame): Unit = {
    val before = codeRows(codes)
    // delete: exactly the tombstoned rows vanish, others untouched
    val del = codeRows(afterDel)
    assert(del.keySet === before.keySet -- dead, s"$name delete")
    assert(del.forall { case (id, c) => before(id) == c }, s"$name delete rows")
    // append: exactly the arrivals added, frozen-model encoded
    val app = codeRows(afterApp)
    val arr = codeRows(transformOf(arrivals))
    assert(app.keySet === before.keySet ++ arr.keySet, s"$name append")
    assert(arr.forall { case (id, c) => app(id) == c },
      s"$name appended rows != frozen transform")
    assert(before.forall { case (id, c) => app(id) == c }, s"$name append base")
    // upsert: one row for the id, encoding the NEW embedding
    val up = codeRows(afterUp)
    assert(up.keySet === before.keySet, s"$name upsert keys")
    assert(up(9L) === codeRows(transformOf(updates))(9L), s"$name upsert row")
    assert((before.keySet - 9L).forall(id => up(id) == before(id)),
      s"$name upsert base rows")
  }

  test("SQ lifecycle + serving under deletes == exact over live corpus") {
    val idx = Sq.train(corpus, "vec_id", "embedding")
    checkFamily("sq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => idx.model.transformDf(df, "vec_id", "embedding"))
    val q = corpus.limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val live = corpus.where(!$"vec_id".isin(dead: _*))
    val served = idx.withDeletes(deadDf)
      .searchRerank(q, live, 5, rerankDepth = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = ExactNN.topK(q, live, 5, ExactNN.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served === exact)
  }

  test("BQ lifecycle") {
    val idx = Bq.train(corpus, "vec_id", "embedding")
    checkFamily("bq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => idx.model.transformDf(df, "vec_id", "embedding"))
  }

  test("PQ lifecycle") {
    val idx = Pq.train(corpus, "vec_id", "embedding",
      PqConfig(numSubvectors = 4, codesPerSubvector = 8, iters = 3, seed = 3L))
    checkFamily("pq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => idx.model.transform(df, "vec_id", "embedding"))
  }

  test("OPQ lifecycle") {
    val idx = graft.ann.pq.Opq.train(corpus, "vec_id", "embedding",
      PqConfig(numSubvectors = 4, codesPerSubvector = 8, iters = 3, seed = 3L),
      opqIters = 3)
    checkFamily("opq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => idx.model.transform(df, "vec_id", "embedding"))
  }

  test("IVF-SQ lifecycle") {
    val cfg = IvfSqConfig(nCells = 4, nProbe = 4, iters = 3, seed = 3L)
    val idx = IvfSq.train(corpus, "vec_id", "embedding", cfg)
    checkFamily("ivfsq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => IvfSq.encode(df, "vec_id", "embedding", cfg, idx.ivf, idx.sq))
  }

  test("IVF-PQ lifecycle + serving under deletes == exact over live corpus") {
    val idx = IvfPq.train(corpus, "vec_id", "embedding",
      IvfPqConfig(nCells = 4, nProbe = 4, numSubvectors = 4,
        codesPerSubvector = 8, iters = 3, seed = 3L))
    checkFamily("ivfpq", idx.codes,
      idx.withDeletes(deadDf).codes, idx.append(arrivals).codes,
      idx.upsert(updates).codes,
      df => idx.model.transform(df, "vec_id", "embedding"))
    val q = corpus.limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val live = corpus.where(!$"vec_id".isin(dead: _*))
    val served = idx.withDeletes(deadDf)
      .searchRerank(q, live, 5, rerankDepth = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = ExactNN.topK(q, live, 5, ExactNN.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served === exact)
  }
}
