package graft.ann.pq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** OPQ: the learned rotation must be orthogonal, the alternation must
  * never end worse than plain PQ (monotone from the PQ warm start),
  * and on anisotropic data — variance concentrated in a few dims, the
  * case plain PQ's blind d/m split handles worst — it must be strictly
  * better. Expression/driver parity and save/load round-trip follow
  * the PqSpec standard. */
class OpqSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val cfg = PqConfig(numSubvectors = 16, codesPerSubvector = 16, seed = 42L)

  private def collectVecs(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
    df.select($"embedding".cast("array<double>")).as[Seq[Double]]
      .collect().map(_.toArray)

  test("rotation is orthogonal (R^T R = I) and deterministic") {
    val m1 = Opq.fit(emb, "embedding", cfg)
    val m2 = Opq.fit(emb, "embedding", cfg)
    val r = m1.rotation.r
    val d = r.length
    var a = 0
    while (a < d) {
      var b = 0
      while (b < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += r(j)(a) * r(j)(b); j += 1 }
        val expect = if (a == b) 1.0 else 0.0
        assert(math.abs(s - expect) < 1e-9, s"R^T R at ($a,$b) = $s")
        b += 1
      }
      a += 1
    }
    assert(m1.rotation.r.map(_.toSeq).toSeq === m2.rotation.r.map(_.toSeq).toSeq)
  }

  test("sample quantization error never exceeds plain PQ (monotone from the PQ start)") {
    val vecs = collectVecs(emb)
    val pq = Pq.fit(emb, "embedding", cfg)
    val opq = Opq.fit(emb, "embedding", cfg)
    val idRot = new Opq.RotationMatrix(
      Array.tabulate(pq.dims, pq.dims)((a, b) => if (a == b) 1.0 else 0.0))
    val pqErr = Opq.sampleError(vecs, new Opq.OpqModel(idRot, pq))
    val opqErr = Opq.sampleError(vecs, opq)
    assert(opqErr <= pqErr + 1e-9, s"opq $opqErr vs pq $pqErr")
  }

  test("strictly better than plain PQ on anisotropic data") {
    // variance concentrated in dims 0-3 (scales 8..5) with near-zero
    // tails: plain PQ spends two full 16-code budgets on noise
    // subspaces while the hot subspaces saturate; the rotation must
    // rebalance and cut the error decisively
    val rnd = new scala.util.Random(7)
    val scales = Array(8.0, 7.0, 6.0, 5.0, 0.1, 0.1, 0.1, 0.1)
    val rows = (0L until 400L).map { i =>
      (i, scales.map(s => s * rnd.nextGaussian()).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val acfg = PqConfig(numSubvectors = 4, codesPerSubvector = 16, seed = 42L)
    val vecs = rows.map(_._2.toArray).toArray
    val pq = Pq.fit(df, "embedding", acfg)
    val idRot = new Opq.RotationMatrix(
      Array.tabulate(8, 8)((a, b) => if (a == b) 1.0 else 0.0))
    val pqErr = Opq.sampleError(vecs, new Opq.OpqModel(idRot, pq))
    val opqErr = Opq.sampleError(vecs, Opq.fit(df, "embedding", acfg))
    assert(opqErr < 0.9 * pqErr, s"opq $opqErr vs pq $pqErr")
  }

  test("varianceSpread separates the pay-OPQ regime from the wash regime") {
    // the anisotropic spec corpus (where OPQ cuts error > 10%): dims
    // 0-3 carry scales 8..5, the tail is near-zero — at m=4 the first
    // subspace hoards the variance
    val rnd = new scala.util.Random(7)
    val scales = Array(8.0, 7.0, 6.0, 5.0, 0.1, 0.1, 0.1, 0.1)
    val aniso = (0L until 400L)
      .map(i => (i, scales.map(s => s * rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
    val hot = Opq.varianceSpread(aniso, "embedding", 4)
    assert(hot > 2.0, s"anisotropic spread $hot should flag OPQ as paying")
    // the near-isotropic testdata corpus (where OPQ measured a wash at
    // 60k): the blind split already balances variance
    val flat = Opq.varianceSpread(emb, "embedding", 16)
    assert(flat < 1.5, s"near-isotropic spread $flat should read as a wash")
    assert(hot > flat)
    assertThrows[IllegalArgumentException](
      Opq.varianceSpread(emb, "embedding", 7)) // 64 % 7 != 0
  }

  test("polarJacobi matches LAPACK's polar factor on a well-conditioned matrix") {
    val rnd = new scala.util.Random(11)
    val d = 12
    val m = Array.fill(d, d)(rnd.nextGaussian())
    val bm = breeze.linalg.DenseMatrix.tabulate[Double](d, d)((i, j) => m(i)(j))
    val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(bm)
    val lapack = u * vt
    val jac = Opq.polarJacobi(m)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(jac(i)(j) - lapack(i, j)) < 1e-8, s"($i,$j)")
    // and it survives a rank-deficient input with an orthogonal result
    val rd = Array.tabulate(d, d)((i, j) => m(i)(0) * m(0)(j)) // rank 1
    val r = Opq.polarJacobi(rd)
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(a) * r(k)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8)
    }
  }

  test("native rotate expression matches driver-side rotation, float and double input") {
    val model = Opq.fit(emb, "embedding", cfg)
    val direct = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> model.rotation(v.toArray).toSeq }.toMap
    Seq(emb,
        emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding")))
      .foreach { in =>
        in.select($"vec_id",
            Opq.rotateCol(model.rotation, $"embedding").as("rot"))
          .as[(Long, Seq[Double])].collect()
          .foreach { case (id, got) =>
            got.zip(direct(id)).foreach { case (g, e) =>
              assert(math.abs(g - e) < 1e-9)
            }
          }
      }
  }

  test("ADC search is well-formed and rerank recovers exact top-k order") {
    val idx = Opq.train(emb, "vec_id", "embedding", cfg)
    val q = emb.orderBy("vec_id").limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val adc = idx.searchAll(q, 5).collect()
    assert(adc.groupBy(_.getLong(0)).forall(_._2.length == 5))
    val rer = idx.searchRerank(q, emb.select($"vec_id", $"embedding"), 1,
      rerankDepth = 100)
    // self is its own nearest neighbor at distance 0 after exact rerank
    rer.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getDouble(2) === 0.0)
    }
  }

  test("save/load round-trips rotation, codebooks and codes") {
    val idx = Opq.train(emb, "vec_id", "embedding", cfg)
    val path = s"/tmp/graft_opq_persist_spec_${ProcessHandle.current().pid()}"
    idx.save(spark, path)
    val re = Opq.load(spark, path)
    assert(re.model.rotation.r.map(_.toSeq).toSeq ===
      idx.model.rotation.r.map(_.toSeq).toSeq)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val a = idx.searchAll(q, 3).orderBy("query_id", "dist", "vec_id").collect()
    val b = re.searchAll(q, 3).orderBy("query_id", "dist", "vec_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("load rejects a partial rotation dump instead of zero-filling it") {
    val idx = Opq.train(emb, "vec_id", "embedding", cfg, opqIters = 2)
    val path = s"/tmp/graft_opq_partial_spec_${ProcessHandle.current().pid()}"
    idx.save(spark, path)
    // drop half the rotation rows — the lost-part-file failure mode
    val partial = spark.read.parquet(s"$path/rotation")
      .where($"row" < idx.model.rotation.dims / 2)
    partial.write.mode("overwrite").parquet(s"$path/rotation_tmp")
    spark.read.parquet(s"$path/rotation_tmp")
      .write.mode("overwrite").parquet(s"$path/rotation")
    val e = intercept[IllegalArgumentException](Opq.load(spark, path))
    assert(e.getMessage.contains("partial or corrupt"))
  }

  test("load rejects a rotation dump whose duplicated cells mask missing ones") {
    val idx = Opq.train(emb, "vec_id", "embedding", cfg, opqIters = 2)
    val path = s"/tmp/graft_opq_dupcell_spec_${ProcessHandle.current().pid()}"
    idx.save(spark, path)
    val d = idx.model.rotation.dims
    // duplicate row 0's cells verbatim while dropping row 1's — total
    // count still d*d, so a count-only guard would zero-fill row 1 and
    // serve a non-orthogonal matrix
    val rot = spark.read.parquet(s"$path/rotation")
    val corrupt = rot.where($"row" =!= 1)
      .unionByName(rot.where($"row" === 0))
    assert(corrupt.count() === d.toLong * d)
    corrupt.write.mode("overwrite").parquet(s"$path/rotation_tmp")
    spark.read.parquet(s"$path/rotation_tmp")
      .write.mode("overwrite").parquet(s"$path/rotation")
    val e = intercept[IllegalArgumentException](Opq.load(spark, path))
    assert(e.getMessage.contains("duplicated cells"))
  }

  test("lifecycle: deletes never served, appends encoded with the frozen model") {
    val idx = Opq.train(emb, "vec_id", "embedding", cfg)
    val q = emb.orderBy("vec_id").limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val dead = idx.searchAll(q, 3).select($"vec_id").distinct().limit(2)
    val deadIds = dead.as[Long].collect().toSet
    val served = idx.withDeletes(dead.toDF("vec_id")).searchAll(q, 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(served.intersect(deadIds).isEmpty)

    val arrivals = emb.orderBy(desc("vec_id")).limit(3)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val appended = idx.append(arrivals)
    assert(appended.codes.count() === idx.codes.count() + 3)
    // an appended duplicate of an existing vector lands at the same codes
    val base = idx.codes.orderBy("vec_id").limit(1).collect()(0)
    val dup = Opq.train(emb, "vec_id", "embedding", cfg)
      .append(emb.where($"vec_id" === base.getLong(0))
        .select(($"vec_id" + 200000L).as("vec_id"), $"embedding"))
      .codes.where($"vec_id" === base.getLong(0) + 200000L).collect()(0)
    assert(dup.getSeq[Int](1) === base.getSeq[Int](1))
  }
}
