package graft.ann.lsh

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Annoy-style random-projection forest — the reference's `Hasher`
  * (reference: lsh/hasher.go). Pure Scala, driver-side; the fitted forest
  * is small (NTrees * treeDepth planes) and is broadcast to executors for
  * hashing (SURVEY.md §2 O2-O7).
  *
  * Semantics mirrored from the reference:
  *   - a splitting plane is the perpendicular bisector of two sampled
  *     points, normal pointing at the larger-norm point
  *     (hasher.go:87-98, 116-119);
  *   - side test is `sign(n·v - d)`: strictly-negative product sets the
  *     bit at the current depth and descends left, else right, no bit
  *     (hasher.go:25-29, 38-51);
  *   - recursion stops at depth > 63 (hash fits a Long) or fewer than 2
  *     vectors; a child is grown only when it holds MORE than `kMinVecs`
  *     vectors (hasher.go:137-161);
  *   - angular metric: sampled points are L2-normalized before plane
  *     construction (zero-norm points become the zero vector,
  *     hasher.go:121-132); query/index vectors are normalized before
  *     hashing but pass through unchanged when their norm <= tol
  *     (hasher.go:198-205). Stored vectors and distances are never
  *     normalized.
  *
  * Deviation (documented, SURVEY.md §7.4): the reference seeds each tree
  * from the wall clock (hasher.go:165); we seed deterministically from
  * `config.seed + treeId` so builds are reproducible and testable.
  */
object Forest {

  val Tol: Double = graft.functions.VectorFunctions.Tol
  val MaxDepth: Int = 63

  final case class Plane(normal: Array[Double], offset: Double) extends Serializable {
    /** True = strictly-negative product side (sets the hash bit, goes left). */
    def negativeSide(v: Array[Double]): Boolean = {
      var s = 0.0
      var i = 0
      while (i < normal.length) { s += normal(i) * v(i); i += 1 }
      // math.signum-free: mirror Go's math.Signbit(prod) which is true
      // only for prod < 0 (and -0.0, irrelevant here)
      s - offset < 0.0
    }

    /** Same test reading straight out of Tungsten ArrayData (codegen
      * expression path — no row materialization). */
    def negativeSideData(a: org.apache.spark.sql.catalyst.util.ArrayData,
                         isFloat: Boolean): Boolean = {
      var s = 0.0
      var i = 0
      while (i < normal.length) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        s += normal(i) * x
        i += 1
      }
      s - offset < 0.0
    }
  }

  sealed trait TreeNode extends Serializable
  case object Leaf extends TreeNode
  final case class Split(plane: Plane, left: TreeNode, right: TreeNode) extends TreeNode

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    val n = norm(v)
    if (n <= Tol) new Array[Double](v.length) // zero-norm -> zero vector
    else v.map(_ / n)
  }

  /** Perpendicular bisector of two points: center c = (p0+p1)/2, normal
    * n = p1 - c, offset d = c·n (reference planeByPoints, hasher.go:87-98). */
  private[lsh] def planeByPoints(p0: Array[Double], p1: Array[Double]): Plane = {
    val dims = p0.length
    val c = new Array[Double](dims)
    val n = new Array[Double](dims)
    var d = 0.0
    var i = 0
    while (i < dims) {
      c(i) = 0.5 * (p0(i) + p1(i))
      n(i) = p1(i) - c(i)
      d += c(i) * n(i)
      i += 1
    }
    Plane(n, d)
  }

  /** Sample two distinct indices, order the pair by ascending norm,
    * normalize in angular mode (reference getRandomPlane,
    * hasher.go:100-134). */
  private def randomPlane(vecs: ArrayBuffer[Array[Double]], angular: Boolean,
                          rng: Random): Plane = {
    val n = vecs.length
    var i0 = rng.nextInt(n)
    var i1 = rng.nextInt(n)
    while (i1 == i0) i1 = rng.nextInt(n)
    var p0 = vecs(i0); var p1 = vecs(i1)
    if (norm(p0) > norm(p1)) { val t = p0; p0 = p1; p1 = t }
    if (angular) planeByPoints(normalized(p0), normalized(p1))
    else planeByPoints(p0, p1)
  }

  private def growTree(vecs: ArrayBuffer[Array[Double]], depth: Int,
                       kMinVecs: Int, angular: Boolean, rng: Random): TreeNode = {
    if (depth > MaxDepth || vecs.length < 2) return Leaf
    val plane = randomPlane(vecs, angular, rng)
    val l = new ArrayBuffer[Array[Double]]
    val r = new ArrayBuffer[Array[Double]]
    vecs.foreach { v => if (plane.negativeSide(v)) l += v else r += v }
    val left = if (l.length > kMinVecs) growTree(l, depth + 1, kMinVecs, angular, rng) else Leaf
    val right = if (r.length > kMinVecs) growTree(r, depth + 1, kMinVecs, angular, rng) else Leaf
    Split(plane, left, right)
  }

  /** Grow one tree over the full sample (every tree sees all vectors, as
    * in the reference where each goroutine gets the whole slice,
    * hasher.go:179-186). */
  def buildTree(vecs: Seq[Array[Double]], kMinVecs: Int, angular: Boolean,
                seed: Long): TreeNode =
    growTree(ArrayBuffer(vecs: _*), 0, kMinVecs, angular, new Random(seed))

  /** Hash = bits of the root-to-leaf path, bit k set when level k chose
    * the negative side (reference traverse, hasher.go:38-51). */
  def hash(tree: TreeNode, v: Array[Double]): Long = {
    var node = tree
    var h = 0L
    var depth = 0
    var done = false
    while (!done) node match {
      case Split(plane, left, right) =>
        if (plane.negativeSide(v)) { h |= (1L << depth); node = left }
        else node = right
        depth += 1
      case Leaf => done = true
    }
    h
  }

  /** Hash walking Tungsten ArrayData directly (codegen expression path). */
  def hashData(tree: TreeNode, a: org.apache.spark.sql.catalyst.util.ArrayData,
               isFloat: Boolean): Long = {
    var node = tree
    var h = 0L
    var depth = 0
    var done = false
    while (!done) node match {
      case Split(plane, left, right) =>
        if (plane.negativeSideData(a, isFloat)) { h |= (1L << depth); node = left }
        else node = right
        depth += 1
      case Leaf => done = true
    }
    h
  }

  /** The multi-probe neighbor bucket: flip the highest set bit (bit 0 for
    * hash 0) — reference lsh.go:146-151. */
  def neighborHash(h: Long): Long = {
    // h is an unsigned bit-path: test h != 0 (not h > 0) so a hash with
    // bit 63 set — negative as a signed Long — still flips its true
    // highest set bit rather than bit 0.
    val pos = if (h != 0) 63 - java.lang.Long.numberOfLeadingZeros(h) else 0
    h ^ (1L << pos)
  }
}
