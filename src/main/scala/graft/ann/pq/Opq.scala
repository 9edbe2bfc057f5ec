package graft.ann.pq

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

import graft.ann.{ModelBroadcast, TopK}

/** Optimized Product Quantization (OPQ): a learned orthogonal rotation
  * applied before PQ so the subvector split lines up with the data's
  * principal directions instead of the raw coordinate order (Ge,
  * He, Ke, Sun, "Optimized Product Quantization", CVPR 2013 — the
  * non-parametric OPQ-NP variant). PQ's blind d/m split is the
  * reference family's known weak spot on correlated dimensions: when
  * variance concentrates in a few dims, some subquantizers burn their
  * code budget on noise while others saturate. The rotation
  * redistributes variance across subspaces at zero serve-time cost
  * beyond one map-side matrix-vector product.
  *
  * Fit is the standard alternation, warm-started from the PLAIN PQ
  * solution (rotation = identity, the same seeded Lloyd's as
  * [[Pq.fit]]), so every step is non-increasing in sample
  * quantization error:
  *
  *   1. re-encode the rotated sample (argmin per subspace — cannot
  *      increase error);
  *   2. orthogonal Procrustes: with reconstructions Y fixed, the
  *      rotation minimizing ||X·R − Y||_F is R = U·Vᵀ from the SVD
  *      X·ᵀY = U·S·Vᵀ (breeze, driver-side on the d×d cross-matrix);
  *   3. warm-started Lloyd refresh of each subspace codebook (means
  *      of current assignments — cannot increase error).
  *
  * Monotonicity makes `sampleError(opq) <= sampleError(pq)` a HARD
  * contract (spec-pinned), not a hope: on isotropic data OPQ degrades
  * to plain PQ; on anisotropic data the gap is the win.
  *
  * Scale shape: the fit is driver-side over the same `sampleCap`
  * sample every k-means family uses; the rotation rides to executors
  * as one broadcast d×d matrix and both encode (build) and query
  * rotation (serve) are map-side native expressions — nothing about
  * PQ's 100 TB scan story changes. The rotated space is L2-isometric
  * (RᵀR = I), so exact rerank and recall grading run on the ORIGINAL
  * vectors unchanged.
  */
object Opq {

  /** Orthogonal rotation, row convention: out[k] = Σ_j v[j]·r(j)(k)
    * (y = x·R for row vectors x). */
  final class RotationMatrix(val r: Array[Array[Double]]) extends Serializable {
    val dims: Int = r.length

    def apply(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](dims)
      var j = 0
      while (j < dims) {
        val x = v(j); val row = r(j)
        if (x != 0.0) {
          var k = 0
          while (k < dims) { out(k) += x * row(k); k += 1 }
        }
        j += 1
      }
      out
    }

    /** Rotation reading float/double elements straight out of Tungsten
      * ArrayData (the native-expression path, same standard as
      * [[PqModel.encodeData]]). */
    def rotateData(a: ArrayData, isFloat: Boolean): Array[Double] = {
      val v = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      apply(v)
    }
  }

  /** ARRAY<DOUBLE> rotated vector — map-side, codegen, one broadcast
    * matrix per executor. */
  case class OpqRotateExpr(child: Expression, bcast: Broadcast[RotationMatrix])
      extends UnaryExpression with ExpectsInputTypes {

    override def prettyName: String = "opq_rotate"

    @transient private lazy val rot: RotationMatrix = bcast.value

    override def inputTypes: Seq[AbstractDataType] =
      Seq(SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(av: Any): Any =
      new GenericArrayData(rot.rotateData(av.asInstanceOf[ArrayData], isFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bref = ctx.addReferenceObj("opqBcast", bcast,
        classOf[Broadcast[RotationMatrix]].getName)
      val cls = classOf[RotationMatrix].getName
      val rref = ctx.addMutableState(cls, "opqRot", v => s"$v = ($cls) $bref.value();")
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $rref.rotateData($a, $isFloat));""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def rotateCol(rot: RotationMatrix, v: Column): Column =
    SparkShim.column(OpqRotateExpr(SparkShim.expression(v), ModelBroadcast.of(rot)))

  final class OpqModel(val rotation: RotationMatrix, val pq: PqModel)
      extends Serializable {
    /** (id, codes) of the ROTATED input — map-side rotate-then-encode,
      * both native expressions in one projection. */
    def transform(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col(idCol).as("vec_id"),
        PqExpressions.pqEncode(pq, rotateCol(rotation, col(vecCol))).as("codes"))
  }

  /** Mean squared quantization error of `vecs` under (R, codebooks) —
    * the quantity the alternation monotonically decreases and the spec
    * compares against plain PQ. */
  def sampleError(vecs: Array[Array[Double]], model: OpqModel): Double = {
    var s = 0.0
    var i = 0
    while (i < vecs.length) {
      val y = model.rotation(vecs(i))
      val rec = model.pq.decode(model.pq.encode(y).toSeq)
      var k = 0
      while (k < y.length) { val d = y(k) - rec(k); s += d * d; k += 1 }
      i += 1
    }
    s / vecs.length
  }

  /** One warm-started Lloyd round per subspace: reassign (argmin, ties
    * by lowest code — [[PqModel.encode]]'s own rule) then recompute
    * means; an emptied centroid keeps its previous position. Both
    * half-steps are non-increasing in quantization error, which is what
    * lets the OPQ alternation keep the ≤-plain-PQ contract. */
  private def warmLloydRound(sub: Array[Array[Double]],
                             cb: Array[Array[Double]]): Array[Array[Double]] = {
    val k = cb.length
    val sd = cb(0).length
    val sums = Array.ofDim[Double](k, sd)
    val counts = new Array[Int](k)
    var i = 0
    while (i < sub.length) {
      val v = sub(i)
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0; var j = 0
        val cc = cb(c)
        while (j < sd && d < bd) { val x = v(j) - cc(j); d += x * x; j += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      val srow = sums(best)
      var j = 0
      while (j < sd) { srow(j) += v(j); j += 1 }
      counts(best) += 1
      i += 1
    }
    Array.tabulate(k) { c =>
      if (counts(c) == 0) cb(c)
      else { val out = new Array[Double](sd); var j = 0
        while (j < sd) { out(j) = sums(c)(j) / counts(c); j += 1 }; out }
    }
  }

  /** Procrustes step: rotation minimizing ||X·R − Y||_F over orthogonal
    * R, i.e. R = U·Vᵀ with XᵀY = U·S·Vᵀ (d×d SVD, driver-side —
    * breeze ships with Spark). */
  private def procrustes(xs: Array[Array[Double]],
                         ys: Array[Array[Double]]): RotationMatrix = {
    val d = xs(0).length
    val m = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var i = 0
    while (i < xs.length) {
      val x = xs(i); val y = ys(i)
      var a = 0
      while (a < d) {
        val xa = x(a)
        if (xa != 0.0) { var b = 0; while (b < d) { m(a, b) += xa * y(b); b += 1 } }
        a += 1
      }
      i += 1
    }
    val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(m)
    val rm = u * vt
    new RotationMatrix(Array.tabulate(d, d)((a, b) => rm(a, b)))
  }

  /** Seeded random orthogonal matrix: QR of a seeded Gaussian (the
    * Haar-ish init OPQ-NP needs to escape the identity basin). */
  private def randomRotation(dims: Int, seed: Long): RotationMatrix = {
    val rnd = new java.util.Random(seed)
    val g = breeze.linalg.DenseMatrix.tabulate[Double](dims, dims)(
      (_, _) => rnd.nextGaussian())
    val breeze.linalg.qr.QR(q, _) = breeze.linalg.qr(g)
    new RotationMatrix(Array.tabulate(dims, dims)((a, b) => q(a, b)))
  }

  /** Per-subspace seeded Lloyd codebooks of the rotated sample. */
  private def lloydCodebooks(rotated: Array[Array[Double]],
                             config: PqConfig): Array[Array[Array[Double]]] = {
    val subDim = rotated(0).length / config.numSubvectors
    val cbs = new Array[Array[Array[Double]]](config.numSubvectors)
    graft.ann.ParallelFit.run(config.numSubvectors) { s =>
      val sub = rotated.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      cbs(s) = graft.ann.ivf.Ivf.lloyd(sub, config.codesPerSubvector, config.iters)
    }
    cbs
  }

  /** The OPQ-NP alternation from one (rotation, codebooks) start:
    * every step (re-encode, Procrustes with reconstructions fixed,
    * warm Lloyd) is non-increasing in sample quantization error. */
  private def alternate(vecs: Array[Array[Double]], config: PqConfig,
                        opqIters: Int, rot0: RotationMatrix,
                        cbs0: Array[Array[Array[Double]]]): OpqModel = {
    val dims = vecs(0).length
    val subDim = dims / config.numSubvectors
    var rot = rot0
    var codebooks = cbs0
    var it = 0
    while (it < opqIters) {
      val model = new PqModel(config, dims, codebooks)
      val rotated = vecs.map(rot(_))
      // reconstructions under current (R, codebooks)
      val recon = rotated.map(y => model.decode(model.encode(y).toSeq))
      rot = procrustes(vecs, recon)
      val rerotated = vecs.map(rot(_))
      val next = new Array[Array[Array[Double]]](config.numSubvectors)
      graft.ann.ParallelFit.run(config.numSubvectors) { s =>
        val sub = rerotated.map(y =>
          java.util.Arrays.copyOfRange(y, s * subDim, (s + 1) * subDim))
        var cb = codebooks(s)
        var r = 0
        while (r < config.iters) { cb = warmLloydRound(sub, cb); r += 1 }
        next(s) = cb
      }
      codebooks = next
      it += 1
    }
    new OpqModel(rot, new PqModel(config, dims, codebooks))
  }

  /** Fit rotation + codebooks on the [[PqConfig.sampleCap]]-bounded
    * sample (same sampling as [[Pq.fit]]). Runs the alternation from
    * `numInits` starts — the identity (warm-started at the plain-PQ
    * solution, so the best candidate can never be worse than PQ by
    * monotonicity) plus seeded random rotations (identity is a local
    * optimum whenever the winning split needs a large basis change,
    * e.g. pairing high-variance dims with low-variance ones — the
    * eigenvalue-allocation argument of Ge et al. §4) — and keeps the
    * lowest-sample-error candidate. Deterministic: seeds derive from
    * `config.seed`, ties go to the earlier init. */
  def fit(df: DataFrame, vecCol: String, config: PqConfig,
          opqIters: Int = 8, numInits: Int = 3): OpqModel = {
    val total = df.count()
    val sampled =
      if (total <= config.sampleCap) df
      else df.sample(withReplacement = false,
        fraction = config.sampleCap.toDouble / total, seed = config.seed)
    val vecs = graft.ann.FitSample.collectVectors(sampled, vecCol)
    val dims = vecs(0).length
    require(dims % config.numSubvectors == 0,
      s"dims $dims must divide into ${config.numSubvectors} subvectors")

    val identity = new RotationMatrix(
      Array.tabulate(dims, dims)((a, b) => if (a == b) 1.0 else 0.0))
    val starts: Seq[RotationMatrix] = identity +:
      (1 until math.max(1, numInits)).map(i =>
        randomRotation(dims, config.seed * 7919L + i))
    val candidates = starts.map { r0 =>
      val model = alternate(vecs, config, opqIters, r0,
        lloydCodebooks(vecs.map(r0(_)), config))
      (Opq.sampleError(vecs, model), model)
    }
    candidates.minBy(_._1)._2
  }

  def train(df: DataFrame, idCol: String, vecCol: String,
            config: PqConfig = PqConfig(), opqIters: Int = 8): OpqIndex = {
    val model = fit(df, vecCol, config, opqIters)
    new OpqIndex(model, model.transform(df, idCol, vecCol))
  }

  /** Reopen a saved index — layout defined by [[OpqIndex.save]]:
    * [[Pq.load]]'s layout plus a `rotation` table (row, col, value). */
  def load(spark: SparkSession, path: String): OpqIndex = {
    val pqIdx = Pq.load(spark, path)
    val rows = spark.read.parquet(s"$path/rotation")
      .select(col("row").cast("int"), col("col").cast("int"), col("value"))
      .collect()
    val d = pqIdx.model.dims
    val r = Array.ofDim[Double](d, d)
    rows.foreach(x => r(x.getInt(0))(x.getInt(1)) = x.getDouble(2))
    new OpqIndex(new OpqModel(new RotationMatrix(r), pqIdx.model), pqIdx.codes)
  }
}

/** Serving wrapper: identical contract to [[PqIndex]] with queries
  * rotated map-side on the way in. Distances reported by ADC live in
  * the rotated space, which is the SAME metric space (orthogonal
  * invariance), so downstream rerank/grading against original vectors
  * is unchanged. */
final class OpqIndex(val model: Opq.OpqModel, val codes: DataFrame) {

  private def inner = new PqIndex(model.pq, codes)

  private def rotated(queries: DataFrame): DataFrame =
    queries.select(col("query_id"),
      Opq.rotateCol(model.rotation, col("qv")).as("qv"))

  def searchAll(queries: DataFrame, k: Int, roundTo: Int = 6): DataFrame =
    inner.searchAll(rotated(queries), k, roundTo)

  /** ADC candidates from rotated codes, exact rerank on ORIGINAL float
    * vectors (isometry makes the two spaces rank-identical under exact
    * distances). */
  def searchRerank(queries: DataFrame, vectors: DataFrame, k: Int,
                   rerankDepth: Int = 100, roundTo: Int = 6): DataFrame = {
    val cands = searchAll(queries, rerankDepth).select("query_id", "vec_id")
    val exact = vectors
      .join(broadcast(cands), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.exprs.l2DistNative(col("qv"), col("embedding")),
          roundTo).as("dist"))
    exact.groupBy("query_id")
      .agg(TopK.topK(k)(col("vec_id"), col("dist")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("n"))
      .select(col("query_id"), col("n.vec_id").as("vec_id"),
        col("n.dist").as("dist"))
  }

  /** Serve-time delete view / frozen-model append / upsert — the
    * uniform 5-family lifecycle contract (CompressedLifecycleSpec).
    * Appends encode arrivals with the FROZEN rotation + codebooks. */
  def withDeletes(tombstones: DataFrame): OpqIndex =
    new OpqIndex(model,
      codes.join(broadcast(tombstones.select("vec_id")),
        Seq("vec_id"), "left_anti"))

  def append(arrivals: DataFrame): OpqIndex =
    new OpqIndex(model,
      codes.unionByName(model.transform(arrivals, "vec_id", "embedding")))

  def upsert(updates: DataFrame): OpqIndex =
    withDeletes(updates.select("vec_id")).append(updates)

  /** [[PqIndex.save]]'s layout plus the rotation as (row, col, value). */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    inner.save(spark, path)
    val r = model.rotation.r
    r.indices.flatMap(a => r(a).indices.map(b => (a, b, r(a)(b))))
      .toDF("row", "col", "value")
      .write.mode("overwrite").parquet(s"$path/rotation")
  }
}
