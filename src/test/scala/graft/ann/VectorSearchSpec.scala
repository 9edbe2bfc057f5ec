package graft.ann

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.lsh.LshConfig

/** Reference-API parity flow: train -> single-query search -> dump ->
  * load -> search again (mirrors the reference's e2e usage,
  * lsh_test.go:228-341 + TestDumpHasher). */
class VectorSearchSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private val data = Seq(
    (0L, Seq(0.10, 0.10)),
    (1L, Seq(0.10, 0.08)),
    (2L, Seq(0.11, 0.09)),
    (3L, Seq(0.09, 0.11)),
    (4L, Seq(-0.10, 0.10)),
    (5L, Seq(-0.10, 0.08)))

  test("train/search/save/load parity flow") {
    val vs = new VectorSearch(spark,
      LshConfig(nTrees = 10, kMinVecs = 2, seed = 11L))
      .train(data.toDF("vec_id", "embedding"))

    val res = vs.search(Array(0.10, 0.10), maxNN = 4, distanceThreshold = 0.02)
    assert(res.length >= 3 && res.length <= 4)
    assert(res.head.vec_id === 0L) // self first, ascending distance
    assert(!res.map(_.vec_id).toSet.exists(Set(4L, 5L)))

    val dir = Files.createTempDirectory("vs_idx").toString
    vs.save(dir)
    val reopened = VectorSearch.load(spark, dir)
    val res2 = reopened.search(Array(0.10, 0.10), 4, 0.02)
    assert(res2 === res)
  }

  test("search before train throws") {
    val vs = new VectorSearch(spark, LshConfig())
    intercept[IllegalStateException](vs.search(Array(1.0), 1, 1.0))
  }
}
