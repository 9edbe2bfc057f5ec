package graft.ann.ivf

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

/** Label-partitioned IVF store — the IVF half of the in-family
  * remediation behind the bucket dispatch's `probe_starved` / bimodal
  * warnings (see [[graft.ann.lsh.LabeledLshIndex]] for the shared
  * rationale; this is the same store rule instantiated on k-means cells
  * instead of forest leaves).
  *
  * The label-scoped probe here is SIMPLER and fully re-derivable in SQL
  * (which `q_ivf_filtered_labeled` exploits): rank ALL centroids by
  * distance to the query — the unconstrained [[IvfModel.probeCells]]
  * order, ties to the lower cell id — and take the first `nProbe` cells
  * the query's label OCCUPIES. Under a correlated filter the label's
  * rows concentrate in few cells and the unconstrained probe wastes its
  * whole budget on cells the filter then empties (the measured 1M
  * collapse: recall 0.655 at correlated 10%); skipping unoccupied cells
  * spends the same budget entirely inside the label's partition, so the
  * serve reaches the label's nearest cells no matter how far they sit.
  *
  * Built from the SAME fitted centroids (`withLabels` is one join, no
  * refit); the per-label occupancy directory is ≤ nCells booleans per
  * label — broadcast-safe at any corpus scale. Multi-label rows land in
  * every partition their labels name. */
final class LabeledIvfIndex(
    val model: IvfModel,
    val vectors: DataFrame,      // (vec_id, embedding)
    val labeledCells: DataFrame  // (label, cell, vec_id)
) {

  /** (label → occupied-cell flags) for `labels` only — bounded by
    * |labels| × nCells, never the corpus. */
  private[ivf] def directoryFor(labels: Seq[String])
      : Map[String, Array[Boolean]] = {
    val rows = labeledCells
      .where(col("label").isin(labels: _*))
      .select(col("label"), col("cell"))
      .distinct()
      .collect()
    rows.groupBy(_.getString(0)).map { case (lbl, rs) =>
      val occ = new Array[Boolean](model.config.nCells)
      rs.foreach(r => occ(r.getInt(1)) = true)
      lbl -> occ
    }
  }

  /** The label-scoped probe rows, as data — `(query_id, label, cell,
    * probe_rank)`, rank = position in the distance-ranked occupied
    * list (the decision `q_ivf_filtered_labeled` re-derives end to end
    * in DuckDB from the dumped centroids + cell table). Queries:
    * `(query_id, qv, label)`; unknown labels yield no probes. */
  def scopedProbeRows(queries: DataFrame): DataFrame = {
    val labels = queries.select(col("label").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq
    val dir = directoryFor(labels)
    queries.select(col("query_id"), col("label").cast("string").as("label"),
        posexplode(LabeledIvf.scopedProbes(model, dir, col("qv"),
          col("label"))))
      .select(col("query_id"), col("label"),
        col("col").cast(IntegerType).as("cell"),
        col("pos").cast(IntegerType).as("probe_rank"))
  }

  /** Label-constrained ANN search over the label-partitioned cell
    * store (the [[graft.ann.lsh.LabeledLshIndex.searchAllLabeled]]
    * twin): candidates come only from the query's label partition, in
    * its nProbe nearest OCCUPIED cells. Same scoring tail as
    * [[IvfIndex.searchAll]]. */
  def searchAllLabeled(queries: DataFrame, k: Int,
                       metric: ExactNN.Metric = ExactNN.L2, roundTo: Int = 6,
                       topKViaAggregator: Boolean = true,
                       probes: Option[DataFrame] = None): DataFrame = {
    val pr = probes.getOrElse(scopedProbeRows(queries))
    val cands = labeledCells
      .join(broadcast(pr.select("label", "cell", "query_id")),
        Seq("label", "cell"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
    CandidateScoring.scoreTopK(cands, vectors, queries, k, None, metric,
      roundTo, topKViaAggregator)
  }

  /** Persist centroids + vectors + the composite-keyed cell table,
    * `partitionBy(label)` with cell-sorted files — a `label = v` serve
    * prunes to one label directory and row-group stats skip to its
    * probed cells. */
  def save(spark: SparkSession, path: String): Unit = {
    new IvfIndex(model, vectors, labeledCells.select("vec_id", "cell"))
      .saveModel(spark, path)
    vectors.write.mode("overwrite").parquet(s"$path/vectors")
    labeledCells
      .repartition(col("label"))
      .sortWithinPartitions("cell")
      .write.mode("overwrite")
      .partitionBy("label")
      .parquet(s"$path/cells")
  }
}

object LabeledIvfIndex {
  def load(spark: SparkSession, path: String): LabeledIvfIndex = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta").head()
    val config = IvfConfig(
      nCells = meta.getAs[Int]("n_cells"),
      nProbe = meta.getAs[Int]("n_probe"),
      iters = meta.getAs[Int]("iters"),
      seed = meta.getAs[Long]("seed"),
      sampleCap = meta.getAs[Int]("sample_cap"),
      angular = meta.getAs[Boolean]("angular"))
    val centroids = spark.read.parquet(s"$path/centroids")
      .select($"cell", $"centroid").as[(Int, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    new LabeledIvfIndex(new IvfModel(config, centroids),
      spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/cells")
        .select(col("label").cast("string").as("label"),
          col("cell").cast("int").as("cell"), col("vec_id")))
  }
}

object LabeledIvf {
  def scopedProbes(model: IvfModel, dir: Map[String, Array[Boolean]],
                   v: Column, label: Column): Column =
    SparkShim.column(IvfScopedProbesExpr(SparkShim.expression(v),
      SparkShim.expression(label), graft.ann.ModelBroadcast.of(model),
      graft.ann.ModelBroadcast.of(dir)))
}

/** ARRAY<INT> of the query's nProbe nearest label-OCCUPIED cells,
  * ascending (distance, cell) — fewer when the label occupies fewer
  * cells, empty for an unknown label. Probe-side only (one eval per
  * query row), so interpreted eval is fine. */
case class IvfScopedProbesExpr(left: Expression, right: Expression,
                               bcast: Broadcast[IvfModel],
                               dirBcast: Broadcast[Map[String, Array[Boolean]]])
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  @transient private lazy val model: IvfModel = bcast.value
  @transient private lazy val dir: Map[String, Array[Boolean]] = dirBcast.value

  override def prettyName: String = "ivf_scoped_probes"
  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(av: Any, lv: Any): Any = {
    val occOpt = dir.get(lv.toString)
    if (occOpt.isEmpty) return new GenericArrayData(Array.empty[Int])
    val occ = occOpt.get
    val a = av.asInstanceOf[ArrayData]
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    new GenericArrayData(model.scopedProbeCells(v, occ))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
