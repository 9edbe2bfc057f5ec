package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss dimensionality reduction by a ±1 sign matrix
  * (Achlioptas 2003, "Database-friendly random projections" — the
  * database-friendly variant precisely because it needs no Gaussian
  * sampling: entries are ±1, the projection is additions only).
  *
  * The sign matrix is NOT sampled — entry (i, j) is derived from
  * `md5("i,j")`: +1 when the first hex nibble is 0-7, −1 otherwise.
  * md5 on ASCII agrees byte-for-byte between the JVM and DuckDB, so the
  * oracle can re-derive the ENTIRE projection independently and
  * hash-compare every projected vector — the same "strongest build
  * oracle" contract as the SQ codes (SimilarityQueries `q_sq_codes`):
  * determinism is what upgrades a seeded transform into a
  * cross-engine-checkable one.
  *
  * Scale shape: the matrix is dimsOut × dimsIn literals baked into the
  * projection expressions (for 64→16, 1 KB of plan constants), so the
  * projection is a pure scan-side map — zero shuffle, zero UDF, inside
  * whole-stage codegen via `zip_with`/`aggregate`. A 100 TB corpus
  * projects in the same pass that reads it.
  */
object RandomProjection {

  /** Deterministic ±1 sign for output dim `i`, input dim `j`. */
  def sign(i: Int, j: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i,$j".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** The dimsOut × dimsIn sign matrix, row i = output dimension i. */
  def signMatrix(dimsIn: Int, dimsOut: Int): Array[Array[Double]] =
    Array.tabulate(dimsOut, dimsIn)((i, j) => sign(i, j))

  /** Projected vector column: out[i] = Σ_j v[j]·sign(i,j) / √dimsOut,
    * each component rounded to `roundTo` so cross-engine float noise
    * cannot break the hash compare. Input may be float or double. */
  def projectCol(vec: Column, dimsIn: Int, dimsOut: Int,
                 roundTo: Int = 6): Column = {
    val signs = signMatrix(dimsIn, dimsOut)
    val scale = math.sqrt(dimsOut.toDouble)
    array(signs.map { row =>
      val rowLit = array(row.map(lit): _*)
      round(
        aggregate(
          zip_with(vec.cast("array<double>"), rowLit, (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x) / scale,
        roundTo)
    }: _*)
  }

  /** The DuckDB-side re-derivation of [[sign]] for oracle SQL: substr 1
    * of md5('i,j') in '01234567' ⇔ +1. Kept here so the Scala rule and
    * the SQL rule sit next to each other. */
  def signSql(iExpr: String, jExpr: String): String =
    s"(CASE WHEN strpos('01234567', substr(md5($iExpr || ',' || $jExpr), 1, 1)) > 0 THEN 1.0 ELSE -1.0 END)"
}
