package graft.ann.lsh

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

import graft.ann.{CandidateScoring, ExactNN}
import graft.ann.lsh.Forest.{Leaf, Split, TreeNode}

/** The per-(label, tree) occupied-leaf set, preprocessed for prefix
  * membership queries. [[Forest.hash]] encodes the root-to-leaf path in
  * the LOW bits (bit k set = the depth-k split chose the negative
  * side), so "does this label have any row under the node at depth d on
  * path p?" is "does any occupied leaf hash agree with p on its low d
  * bits?". Leaf hashes are stored BIT-REVERSED (the path becomes the
  * most-significant bits, turning a path prefix into one contiguous
  * unsigned range) and sign-flipped (signed sort = unsigned order),
  * sorted — membership is then a single binary search.
  *
  * Size contract (what makes the label-partitioned store scale): the
  * occupied set is a subset of the FITTED forest's leaves, so it is
  * bounded by sampleCap / kMinVecs per tree regardless of corpus size —
  * a 100 TB corpus with the default 100k-row fit sample has at most
  * ~2k leaves per tree, and a label's whole directory broadcasts in a
  * few KB. */
final class OccupiedLeaves(val keys: Array[Long]) extends Serializable {

  def nonEmpty: Boolean = keys.length > 0

  /** Any occupied leaf whose path starts with the low `depth` bits of
    * `prefix`? (`depth` in [0, 64]; depth 0 asks "any leaf at all".) */
  def hasPrefix(prefix: Long, depth: Int): Boolean = {
    if (keys.length == 0) return false
    if (depth == 0) return true
    val uLo = java.lang.Long.reverse(prefix) // path bits now most-significant
    val span = 1L << (64 - depth)            // depth >= 1, so shift in [0, 63]
    val uHi = uLo + span                     // wraps to exactly 0 at the top range
    val loF = uLo ^ Long.MinValue
    var i = java.util.Arrays.binarySearch(keys, loF)
    if (i < 0) i = -i - 1
    i < keys.length && (uHi == 0L || keys(i) < (uHi ^ Long.MinValue))
  }
}

object OccupiedLeaves {
  /** Build from raw leaf hashes (any order, duplicates tolerated). */
  def apply(hashes: Array[Long]): OccupiedLeaves = {
    val keys = hashes.map(h => java.lang.Long.reverse(h) ^ Long.MinValue)
    java.util.Arrays.sort(keys)
    new OccupiedLeaves(keys)
  }
}

/** Label-partitioned LSH store — the IN-FAMILY remediation behind the
  * `probe_starved` / bimodal warnings of
  * [[LshIndex.searchAllFiltered]]'s density dispatch (the bucket twin
  * of [[graft.ann.KnnGraph.labelAware]], round 17; Filtered-DiskANN's
  * build-time rule, arXiv:2211.12850, re-expressed on the stored bucket
  * structure).
  *
  * Why probe-then-filter cannot be fixed at serve time: under a filter
  * correlated with query geometry, the query's NEAR allowed rows live
  * in buckets its probes never visit — measured at 1M (SCALE.md
  * §filtered ANN): recall 0.513 at correlated 10%, and the engine's own
  * tree-doubling measurement (nTrees 20→40: 0.513→0.531) shows no probe
  * budget reaches them. The fix must change WHICH buckets a constrained
  * query probes.
  *
  * The label-scoped probe: the store keys buckets by the composite
  * `(label, tree_id, hash)` and serving descends each FITTED tree with
  * forced turns — follow the query's side of every split whenever the
  * label has at least one leaf under it, take the other side otherwise
  * ([[LabeledLsh.scopedProbePair]]). The landing leaf is the label's
  * occupied bucket with the MAXIMAL common path prefix with the query's
  * own bucket (the greedy rule turns as deep as occupancy allows), and
  * below the forced turn the descent keeps consulting the real splitting
  * planes, so within the label's subtree the choice stays geometric —
  * per tree, the label's nearest bucket the forest can name. Probes
  * 2..p per tree re-descend from the first descent's two-sided splits
  * DEEPEST-FIRST — the scoped generalization of
  * [[Forest.neighborHash]]'s bit-flip (which is exactly the deepest
  * alternative in the unconstrained case); the default budget
  * ([[LabeledLshIndex.DefaultProbesPerTree]]) is measured, not
  * inherited.
  *
  * Built from the SAME fitted model — `withLabels` joins the existing
  * buckets table with a `(vec_id, label)` frame; no second fit, no new
  * planes. Multi-label rows are supported by construction (a vector
  * with two labels appears in both label partitions).
  *
  * Scale shape: the per-label probe directory is bounded by the fitted
  * forest's leaf count (see [[OccupiedLeaves]]) — a serve collects only
  * the directory slices of the labels its queries name, never the
  * store. The candidate join stays the [[LshIndex.searchAll]] shape
  * (broadcast probe rows against the stored table, equi-join on the
  * composite key — partition-pruned when saved `partitionBy(label)`). */
final class LabeledLshIndex(
    val model: LshModel,
    val vectors: DataFrame,        // (vec_id, embedding)
    val labeledBuckets: DataFrame  // (label, tree_id, hash, vec_id)
) {

  /** The (label, tree) → occupied-leaf directory for `labels` only —
    * the driver-side collect is bounded by |labels| × nTrees ×
    * (sampleCap / kMinVecs) longs (the [[OccupiedLeaves]] size
    * contract), NOT by the corpus. */
  private[lsh] def directoryFor(labels: Seq[String])
      : Map[String, Array[OccupiedLeaves]] = {
    val nTrees = model.config.nTrees
    val rows = labeledBuckets
      .where(col("label").isin(labels: _*))
      .select(col("label"), col("tree_id"), col("hash"))
      .distinct()
      .collect()
    rows.groupBy(_.getString(0)).map { case (lbl, rs) =>
      val perTree = Array.fill(nTrees)(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      rs.foreach(r => perTree(r.getInt(1)) += r.getLong(2))
      lbl -> perTree.map(b => OccupiedLeaves(b.toArray))
    }
  }

  /** The label-scoped probe rows a [[searchAllLabeled]] call serves
    * from, as data — `(query_id, label, tree_id, hash, probe_rank)`
    * with rank 0 = the scoped own bucket (max-prefix contract, which
    * `q_lsh_filtered_labeled` re-checks in DuckDB) and ranks 1..p-1 =
    * the deepest-first alternative re-descents. Queries:
    * `(query_id, qv, label)`; a label absent from the store yields no
    * probes (and so an empty result), never an error. */
  def scopedProbeRows(queries: DataFrame,
                      probesPerTree: Int =
                        LabeledLshIndex.DefaultProbesPerTree): DataFrame = {
    val labels = queries.select(col("label").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq
    val dir = directoryFor(labels)
    queries.select(col("query_id"), col("label").cast("string").as("label"),
        posexplode(LabeledLsh.scopedProbes(model, dir, col("qv"),
          col("label"), probesPerTree)))
      .select(col("query_id"), col("label"),
        (col("pos") / probesPerTree).cast(IntegerType).as("tree_id"),
        col("col").as("hash"),
        pmod(col("pos"), lit(probesPerTree)).cast(IntegerType)
          .as("probe_rank"))
      // stride padding repeats probe 0 and alternatives can coincide:
      // keep one row per bucket, at the strongest rank
      .groupBy("query_id", "label", "tree_id", "hash")
      .agg(min("probe_rank").as("probe_rank"))
  }

  /** Label-constrained ANN search over the label-partitioned store:
    * every query's candidates come only from ITS label's partition, via
    * the scoped probes — the serving rule that recovers the measured
    * correlated-filter collapse (SCALE.md §filtered ANN, round 17: the
    * correlated arms LSH 0.551 / 0.228 at 1M recover on label-scoped
    * serving). Same scoring tail as [[LshIndex.searchAll]] (same
    * rounding, ties, bounded top-k). Pass `probes` to serve from a
    * precomputed/dumped [[scopedProbeRows]] frame (the oracle-row
    * pattern); otherwise they are derived here. */
  def searchAllLabeled(queries: DataFrame, k: Int, distanceThreshold: Double,
                       metric: ExactNN.Metric = ExactNN.L2, roundTo: Int = 6,
                       topKViaAggregator: Boolean = true,
                       probes: Option[DataFrame] = None,
                       probesPerTree: Int =
                         LabeledLshIndex.DefaultProbesPerTree): DataFrame = {
    val pr = probes.getOrElse(scopedProbeRows(queries, probesPerTree))
    val cands = labeledBuckets
      .join(broadcast(pr.select("label", "tree_id", "hash", "query_id")),
        Seq("label", "tree_id", "hash"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
    CandidateScoring.scoreTopK(cands, vectors, queries, k,
      Some(distanceThreshold), metric, roundTo, topKViaAggregator)
  }

  /** Persist model + vectors + the composite-keyed buckets table,
    * `partitionBy(label, tree_id)` with hash-sorted files — a serve for
    * `label = v` prunes to that label's directories at the storage
    * layer (the [[LshIndex.save]] layout rule, extended by the label
    * key). */
  def save(spark: SparkSession, path: String): Unit = {
    model.save(spark, s"$path/model")
    vectors.write.mode("overwrite").parquet(s"$path/vectors")
    labeledBuckets
      .repartition(col("label"), col("tree_id"))
      .sortWithinPartitions("hash")
      .write.mode("overwrite")
      .partitionBy("label", "tree_id")
      .parquet(s"$path/buckets")
  }
}

object LabeledLshIndex {
  /** Scoped probes per tree: probe 0 (the max-prefix leaf) + 3
    * deepest-first alternative re-descents — 2x the unconstrained
    * search's 2 probes/tree, paying for the harder problem (the label's
    * nearest region is farther from the query's own path than the
    * unconstrained nearest). Measured on the dispatch-spec geometry and
    * at 1M (SCALE.md §filtered ANN, round 17): the recall knee sits at
    * 4; 2 under-serves the starved arms and 8 buys little at ~2x probe
    * volume. */
  val DefaultProbesPerTree = 4

  def load(spark: SparkSession, path: String): LabeledLshIndex = {
    val model = LshModel.load(spark, s"$path/model")
    val vectors = spark.read.parquet(s"$path/vectors")
    val buckets = spark.read.parquet(s"$path/buckets")
      .select(col("label").cast("string").as("label"),
        col("tree_id").cast("int").as("tree_id"), col("hash"), col("vec_id"))
    new LabeledLshIndex(model, vectors, buckets)
  }
}

object LabeledLsh {

  /** One greedy forced-turn descent: from `node` at (`prefix`,
    * `depth`), follow the query's side of every split whenever the
    * occupied set has a leaf under it, take the other side otherwise;
    * optionally record every TWO-SIDED split passed (the restart points
    * for alternative probes). Returns the landing leaf's hash. Requires
    * the starting prefix to be occupied. */
  private def descend(start: TreeNode, startPrefix: Long, startDepth: Int,
                      v: Array[Double], occ: OccupiedLeaves,
                      branches: scala.collection.mutable.ArrayBuffer[(TreeNode, Long, Int)])
      : Long = {
    var node = start
    var h = startPrefix
    var depth = startDepth
    var done = false
    while (!done) node match {
      case Split(plane, left, right) =>
        val wantLeft = plane.negativeSide(v)
        val leftPrefix = h | (1L << depth)
        val leftOcc = occ.hasPrefix(leftPrefix, depth + 1)
        val rightOcc = occ.hasPrefix(h, depth + 1)
        val goLeft = if (wantLeft) leftOcc else !rightOcc
        if (branches != null && leftOcc && rightOcc) {
          // the side NOT taken, as a restart point
          if (goLeft) branches += ((right, h, depth + 1))
          else branches += ((left, leftPrefix, depth + 1))
        }
        if (goLeft) { h = leftPrefix; node = left } else node = right
        depth += 1
      case Leaf => done = true
    }
    h
  }

  /** Label-scoped probes for one fitted tree, up to `probesPerTree`
    * (see [[LabeledLshIndex]]'s scaladoc for the rule and why). Probe 0
    * is the greedy forced-turn descent's leaf — it satisfies the
    * max-common-prefix contract with the query's own path (the greedy
    * descent only turns when occupancy forces it, so it diverges at the
    * deepest depth any occupied leaf allows). Probes 1..p-1 come from a
    * BEST-FIRST exploration over the untaken sides of two-sided splits:
    * every descent records its branch points into one priority queue
    * ordered deepest-first (deeper divergence = longer shared path =
    * the geometrically nearer alternative region — the scoped
    * generalization of [[Forest.neighborHash]]'s highest-bit flip,
    * which is exactly the deepest alternative in the unconstrained
    * case), and each popped branch point re-descends greedily, feeding
    * ITS branch points back into the queue. As the budget grows the
    * exploration converges to every leaf the label occupies — the
    * exact-over-subset limit. Deterministic: ties in depth break by
    * discovery order. Requires `occ.nonEmpty`. */
  private[lsh] def scopedProbesForTree(tree: TreeNode, v: Array[Double],
                                       occ: OccupiedLeaves,
                                       probesPerTree: Int): Array[Long] = {
    val branches =
      scala.collection.mutable.ArrayBuffer.empty[(TreeNode, Long, Int)]
    var seq = 0
    // (depth, discovery seq) priority: deepest first, then first found
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Int, Int, TreeNode, Long)](
        Ordering.by { case (d, s, _, _) => (d, -s) })
    val out = scala.collection.mutable.ArrayBuffer(
      descend(tree, 0L, 0, v, occ, branches))
    while (out.length < probesPerTree &&
        (branches.nonEmpty || pq.nonEmpty)) {
      branches.foreach { case (n, p, d) => pq.enqueue((d, seq, n, p)); seq += 1 }
      branches.clear()
      if (pq.nonEmpty) {
        val (d, _, n, p) = pq.dequeue()
        out += descend(n, p, d, v, occ, branches)
      }
    }
    out.toArray
  }

  /** All per-tree scoped probes of one vector, flat with a FIXED stride
    * of `probesPerTree` per tree (pos / stride = tree_id, pos % stride
    * = probe rank; trees with fewer branch points pad by repeating
    * probe 0, which the caller's min-rank dedup collapses). Normalizes
    * first in angular mode (the [[LshModel.hashes]] contract). Empty
    * when the label is unknown; per-tree occupancy is all-or-nothing
    * for a label (every row hashes into every tree). */
  private[lsh] def scopedProbesOf(model: LshModel,
                                  occ: Array[OccupiedLeaves],
                                  v: Array[Double],
                                  probesPerTree: Int): Array[Long] = {
    val vv =
      if (!model.config.angular) v
      else {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val n = math.sqrt(s)
        if (n <= Forest.Tol) v else v.map(_ / n)
      }
    val out = new Array[Long](probesPerTree * model.trees.length)
    var t = 0
    while (t < model.trees.length) {
      val probes = scopedProbesForTree(model.trees(t), vv, occ(t),
        probesPerTree)
      var j = 0
      while (j < probesPerTree) {
        out(probesPerTree * t + j) = probes(math.min(j, probes.length - 1))
        j += 1
      }
      t += 1
    }
    out
  }

  def scopedProbes(model: LshModel, dir: Map[String, Array[OccupiedLeaves]],
                   v: Column, label: Column, probesPerTree: Int): Column =
    SparkShim.column(LshScopedProbesExpr(SparkShim.expression(v),
      SparkShim.expression(label), LshModelBroadcast.of(model),
      graft.ann.ModelBroadcast.of(dir), probesPerTree))
}

/** ARRAY<BIGINT> of probesPerTree*nTrees label-scoped probe hashes
  * (fixed stride; empty for a label absent from the directory).
  * Probe-side only — evaluated once per QUERY row, never per corpus
  * row — so interpreted eval ([[CodegenFallback]]) is fine; the
  * directory and model ride as broadcast handles like
  * [[LshHashesExpr]]'s. */
case class LshScopedProbesExpr(left: Expression, right: Expression,
                               bcast: Broadcast[LshModel],
                               dirBcast: Broadcast[Map[String, Array[OccupiedLeaves]]],
                               probesPerTree: Int)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  @transient private lazy val model: LshModel = bcast.value
  @transient private lazy val dir: Map[String, Array[OccupiedLeaves]] =
    dirBcast.value

  override def prettyName: String = "lsh_scoped_probes"
  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(av: Any, lv: Any): Any = {
    val occ = dir.get(lv.toString)
    if (occ.isEmpty) return new GenericArrayData(Array.empty[Long])
    val a = av.asInstanceOf[ArrayData]
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    new GenericArrayData(LabeledLsh.scopedProbesOf(model, occ.get, v,
      probesPerTree))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
