package graft.ann.pq

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

import graft.ann.ModelBroadcast

/** Precomputed per-query ADC lookup tables, keyed by query_id — the
  * whole point of asymmetric-distance computation: the (m x k) table of
  * subvector distances is built ONCE per query (driver-side, since the
  * query set is small and broadcast anyway) and a candidate's distance
  * is then m array lookups. Ships to executors as a memoized broadcast
  * handle ([[graft.ann.ModelBroadcast]]) — one deserialized copy per
  * executor, like the LSH/IVF model objects.
  */
final class PqAdcTables(entries: Array[(Long, Array[Array[Double]])])
    extends Serializable {

  private val tables = {
    val m = new java.util.HashMap[java.lang.Long, Array[Array[Double]]](entries.length * 2)
    entries.foreach { case (id, t) => m.put(id, t) }
    m
  }

  /** sqrt of the summed per-subvector table lookups for one candidate. */
  def dist(queryId: Long, codes: ArrayData): Double = {
    val t = tables.get(queryId)
    if (t == null)
      throw new IllegalArgumentException(s"no ADC table for query_id $queryId")
    var s = 0.0
    var i = 0
    while (i < t.length) { s += t(i)(codes.getInt(i)); i += 1 }
    math.sqrt(s)
  }
}

/** ARRAY<INT> PQ codes of a vector: argmin codebook centroid per
  * subvector, reading float/double elements straight out of Tungsten
  * ArrayData (no ScalaUDF encoder round-trip on the touches-every-row
  * encode path — same standard as LshHashesExpr / IvfCellExpr). */
case class PqEncodeExpr(child: Expression, bcast: Broadcast[PqModel])
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "pq_encode"

  @transient private lazy val model: PqModel = bcast.value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(av: Any): Any =
    new GenericArrayData(model.encodeData(av.asInstanceOf[ArrayData], isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bref = ctx.addReferenceObj("pqBcast", bcast,
      classOf[Broadcast[PqModel]].getName)
    val cls = classOf[PqModel].getName
    val mref = ctx.addMutableState(cls, "pqModel", v => s"$v = ($cls) $bref.value();")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $mref.encodeData($a, $isFloat));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** DOUBLE approximate L2 distance of (query_id BIGINT, codes ARRAY<INT>)
  * via the broadcast precomputed ADC tables: m lookups per row. */
case class PqAdcDistExpr(left: Expression, right: Expression,
                         bcast: Broadcast[PqAdcTables])
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "pq_adc_dist"

  @transient private lazy val tables: PqAdcTables = bcast.value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(qid: Any, codes: Any): Any =
    tables.dist(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bref = ctx.addReferenceObj("pqTablesBcast", bcast,
      classOf[Broadcast[PqAdcTables]].getName)
    val cls = classOf[PqAdcTables].getName
    val tref = ctx.addMutableState(cls, "pqTables", v => s"$v = ($cls) $bref.value();")
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $tref.dist($q, $c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqExpressions {
  import SparkShim.{column, expression}

  def pqEncode(model: PqModel, v: Column): Column =
    column(PqEncodeExpr(expression(v), ModelBroadcast.of(model)))

  def pqAdcDist(tables: PqAdcTables, queryId: Column, codes: Column): Column =
    column(PqAdcDistExpr(expression(queryId), expression(codes),
      ModelBroadcast.of(tables)))
}
