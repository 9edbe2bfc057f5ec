package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig}

/** Index save/load round-trips: a reopened index must return exactly the
  * same search results, and the buckets/cells tables must be laid out
  * partitioned by their probe key (the at-rest pruning contract). */
class IndexPersistenceSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def queries = emb.orderBy("vec_id").limit(20)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("LSH index round-trip: identical search results, partitioned layout") {
    val dir = Files.createTempDirectory("lsh_idx").toString
    val idx = Lsh.train(emb, "vec_id", "embedding",
      LshConfig(nTrees = 8, kMinVecs = 30, seed = 5L))
    idx.save(spark, dir)
    val reopened = Lsh.load(spark, dir)

    val a = idx.searchAll(queries, 10, 1.3, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = reopened.searchAll(queries, 10, 1.3, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)

    // partitionBy(tree_id) layout on disk
    val partDirs = new java.io.File(s"$dir/buckets").listFiles()
      .filter(_.getName.startsWith("tree_id="))
    assert(partDirs.length === 8)
  }

  test("IVF index round-trip: identical search results, partitioned layout") {
    val dir = Files.createTempDirectory("ivf_idx").toString
    val idx = Ivf.train(emb, "vec_id", "embedding",
      IvfConfig(nCells = 8, nProbe = 3, seed = 5L))
    idx.save(spark, dir)
    val reopened = Ivf.load(spark, dir)

    assert(reopened.model.centroids.map(_.toSeq).toSeq ===
      idx.model.centroids.map(_.toSeq).toSeq)
    val a = idx.searchAll(queries, 10, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    val b = reopened.searchAll(queries, 10, ExactNN.L2)
      .orderBy("query_id", "dist", "vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)

    val partDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(partDirs.length === 8)
  }
}
