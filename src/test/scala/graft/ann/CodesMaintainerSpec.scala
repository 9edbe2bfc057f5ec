package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ivfsq.{IvfSq, IvfSqConfig}
import graft.ann.sq.Sq

/** [[CodesMaintainer]] — the LSM loop over a stored compressed-codes
  * table. Identity under test: after mixed add/delete/upsert batches,
  * `liveCodes` is row-identical to the in-memory lifecycle chain
  * (withDeletes/append/upsert) applying the same ops; compaction folds
  * the logs into the base without changing a row and preserves the
  * family's partition layout; the seq counter recovers from the
  * persisted logs on reconstruction (the LshMaintainer restart rule).
  */
class CodesMaintainerSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def mkCorpus(n: Int, seed: Int = 11) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  private def rows(codes: DataFrame): Map[Long, String] =
    codes.collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.schema.fieldNames.filterNot(_ == "vec_id").sorted
          .map(f => r.get(r.fieldIndex(f))).mkString("|"))
    }.toMap

  test("SQ codes LSM: batches == in-memory chain; compaction; restart recovery") {
    val corpus = mkCorpus(40)
    val idx = Sq.train(corpus, "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_sq").toString + "/idx"
    idx.save(spark, path)

    val arrivals1 = mkCorpus(50, seed = 29).where($"vec_id" >= 40L)
    val dead1 = Seq(2L, 9L)
    // upsert: id 5 takes id 0's embedding
    val newEmb = corpus.where($"vec_id" === 0L)
      .select($"embedding").as[Seq[Double]].head()
    val up2 = Seq(5L -> newEmb).toDF("vec_id", "embedding")

    def enc(df: DataFrame) = idx.model.transformDf(df, "vec_id", "embedding")
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 3,
      occupancyWatermark = 10.0)

    m.onBatch(Some(arrivals1), Some(dead1.toDF("vec_id")))
    m.onBatch(Some(up2), Some(up2.select("vec_id")))
    // at-rest growth counts delta rows INCLUDING tombstoned ones:
    // 40 base + 10 arrivals + 1 upsert re-add over the 40-row fit
    assert(math.abs(m.atRestGrowth - 51.0 / 40.0) < 1e-9,
      s"at-rest growth ${m.atRestGrowth}")

    val chain = idx.withDeletes(dead1.toDF("vec_id"))
      .append(arrivals1).upsert(up2)
    assert(rows(m.liveCodes) === rows(chain.codes),
      "LSM view != in-memory lifecycle chain")

    // restart: a reconstructed maintainer continues the sequence
    val m2 = new CodesMaintainer(spark, path, enc, compactEvery = 3)
    assert(m2.batchesSeen === 2, s"seq not recovered: ${m2.batchesSeen}")
    assert(m2.compactionDue)

    // batch 3 (empty) triggers compaction: base == view, logs gone
    m2.onBatch(None, None)
    val reloaded = Sq.load(spark, path)
    assert(rows(reloaded.codes) === rows(chain.codes),
      "compacted base != lifecycle chain")
    assert(new CodesMaintainer(spark, path, enc, compactEvery = 3)
      .batchesSeen === 0, "logs survived compaction")
  }

  test("IVF-SQ codes LSM keeps the partitionBy(cell) layout through delta and compaction") {
    val corpus = mkCorpus(40)
    val cfg = IvfSqConfig(nCells = 4, nProbe = 4, iters = 3, seed = 3L)
    val idx = IvfSq.train(corpus, "vec_id", "embedding", cfg)
    val path = java.nio.file.Files
      .createTempDirectory("codes_lsm_ivfsq").toString + "/idx"
    idx.save(spark, path)

    def enc(df: DataFrame) =
      IvfSq.encode(df, "vec_id", "embedding", cfg, idx.ivf, idx.sq)
    val m = new CodesMaintainer(spark, path, enc, compactEvery = 2,
      partitionCols = Seq("cell"))

    val arrivals = mkCorpus(50, seed = 29).where($"vec_id" >= 40L)
    val dead = Seq(1L, 7L)
    m.onBatch(Some(arrivals), Some(dead.toDF("vec_id")))

    // the delta log is cell-partitioned (probe pruning prunes delta
    // files exactly like base files)
    val deltaDirs = new java.io.File(s"$path/codes_delta").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(deltaDirs.exists(_.startsWith("cell=")),
      s"delta not partitioned by cell: ${deltaDirs.toSeq}")

    val chain = idx.withDeletes(dead.toDF("vec_id")).append(arrivals)
    assert(rows(m.liveCodes) === rows(chain.codes))

    // batch 2 triggers compaction; layout and rows preserved
    m.onBatch(None, None)
    val baseDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(baseDirs.exists(_.startsWith("cell=")),
      s"compacted base lost cell partitioning: ${baseDirs.toSeq}")
    val reloaded = IvfSq.load(spark, path)
    assert(rows(reloaded.codes) === rows(chain.codes))
  }
}
