package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math over `ARRAY<FLOAT/DOUBLE>` columns, composed from Spark's
  * built-in higher-order functions (`zip_with` / `aggregate` / `transform`)
  * so every operator stays inside whole-stage codegen and is expressible in
  * ANSI-ish SQL for the DuckDB oracle.
  *
  * Semantics mirror the reference metrics
  * (reference: lsh/helpers.go:133-149 L2, lsh/helpers.go:219-234 cosine,
  * lsh/helpers.go:13-15 tolerance):
  *   - L2 = sqrt(sum((a-b)^2))
  *   - cosine distance = 1 - dot/(|a||b|); 1.0 when either norm <= tol;
  *     clamped to 0.0 when below tol.
  *
  * All functions compute in DOUBLE regardless of input element type (the
  * reference widens float32 input to float64 the same way,
  * lsh/helpers.go:23-31).
  */
object VectorFunctions {

  /** Zero-norm / clamp tolerance (reference: lsh/helpers.go:13-15). */
  val Tol: Double = 1e-6

  /** Cast an array column to ARRAY<DOUBLE> (reference widening, O23). */
  def toDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Dot product: sum over elementwise products. Sequential left-to-right
    * fold — same evaluation order as DuckDB's list_reduce, which keeps
    * float results bit-comparable for the oracle. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 distance (no final sqrt). */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean distance (reference: lsh/helpers.go:133-149). */
  def l2Dist(a: Column, b: Column): Column = sqrt(l2DistSq(a, b))

  /** L2 norm of a vector (reference: blas64.Nrm2, annbench/annbench.go:241). */
  def vecNorm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine distance in [0, 2] with the reference's zero-norm guard and
    * small-value clamp (reference: lsh/helpers.go:219-234). */
  def cosineDist(a: Column, b: Column): Column = {
    val na = vecNorm(a)
    val nb = vecNorm(b)
    val raw = lit(1.0) - dotProduct(a, b) / (na * nb)
    when(na <= Tol || nb <= Tol, lit(1.0))
      .otherwise(when(raw < Tol, lit(0.0)).otherwise(raw))
  }

  /** Elementwise standard scaling `(x - mean) / std`
    * (reference: StandartScaler, lsh/helpers.go:152-191). `mean` and `std`
    * are array columns of the same length as `v`. */
  def scaleVec(v: Column, mean: Column, std: Column): Column =
    zip_with(
      zip_with(toDouble(v), toDouble(mean), (x, m) => x - m),
      toDouble(std),
      (x, s) => x / s)

  /** Normalize to unit L2 norm; vectors with norm <= tol pass through
    * unchanged (reference normalizes sampled points and hash inputs in
    * angular mode, lsh/hasher.go:121-132, 198-205).
    *
    * The norm is bound ONCE as a lambda variable (a `transform` over a
    * one-element array) instead of being referenced by the per-element
    * lambda directly: a lambda body is re-evaluated per array element
    * with no cross-invocation subexpression elimination, so the naive
    * form (`transform(v, x => x / vecNorm(v))`) recomputes the O(d) norm
    * d times — the same O(d^2)-per-row trap q_embedding_quantize hit
    * (VectorPlanSpec). Single-Column form on purpose: usable anywhere a
    * Column fits, no helper projection required. */
  def l2Normalize(v: Column): Column = {
    val dv = toDouble(v)
    element_at(
      transform(array(vecNorm(v)), n =>
        when(n <= Tol, dv).otherwise(transform(dv, x => x / n))),
      1)
  }

  /** Convert a chord ("angular", sqrt(2(1-cos))) distance to cosine
    * distance: ang^2 / 2 (reference: AngularToCosineDist,
    * lsh/helpers.go:239-241). For translating thresholds between the two
    * metric conventions — the reference's commented-out chord metric vs
    * the live 1-cos form. Scala double overloads alongside the Column
    * forms, for driver-side threshold arithmetic. */
  def angularToCosineDist(angular: Column): Column = angular * angular / lit(2.0)
  def angularToCosineDist(angular: Double): Double = angular * angular / 2.0

  /** Inverse of [[angularToCosineDist]]: sqrt(2 * cos_dist)
    * (reference: CosineDistToAngular, lsh/helpers.go:243-245). */
  def cosineDistToAngular(cosine: Column): Column = sqrt(cosine * lit(2.0))
  def cosineDistToAngular(cosine: Double): Double = math.sqrt(2.0 * cosine)
}
