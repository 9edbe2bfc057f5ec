package graft.ann.ivf

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

import graft.ann.ModelBroadcast

/** Native cell-assignment/probe expressions over the fitted centroids —
  * same design as [[graft.ann.lsh.LshExpressionsSpec LshHashesExpr]]:
  * the model ships as a memoized broadcast handle (one deserialized copy
  * per executor, [[graft.ann.ModelBroadcast]]) and the argmin loop reads
  * elements straight out of Tungsten ArrayData (no encoder round-trip on
  * the assignment path that touches every corpus row). */
private[ivf] trait IvfModelExpression extends UnaryExpression with ExpectsInputTypes {
  def bcast: Broadcast[IvfModel]

  @transient protected lazy val model: IvfModel = bcast.value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))

  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Codegen: cache `bcast.value()` in a per-operator slot so the
    * per-row path pays no broadcast lookup. */
  protected def modelRef(ctx: CodegenContext): String = {
    val bref = ctx.addReferenceObj("ivfBcast", bcast,
      classOf[Broadcast[IvfModel]].getName)
    val cls = classOf[IvfModel].getName
    ctx.addMutableState(cls, "ivfModel", v => s"$v = ($cls) $bref.value();")
  }
}

/** INT id of the closest centroid (ties -> lowest cell). */
case class IvfCellExpr(child: Expression, bcast: Broadcast[IvfModel])
    extends IvfModelExpression {
  override def prettyName: String = "ivf_cell"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(av: Any): Any =
    model.cellOfData(av.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = modelRef(ctx)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mref.cellOfData($a, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ARRAY<INT> of the nProbe closest cells, ascending distance. */
case class IvfProbesExpr(child: Expression, bcast: Broadcast[IvfModel])
    extends IvfModelExpression {
  override def prettyName: String = "ivf_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(av: Any): Any =
    new GenericArrayData(model.probeCellsData(av.asInstanceOf[ArrayData], isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = modelRef(ctx)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $mref.probeCellsData($a, $isFloat));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfExpressions {
  import SparkShim.{column, expression}

  def ivfCell(model: IvfModel, v: Column): Column =
    column(IvfCellExpr(expression(v), ModelBroadcast.of(model)))

  def ivfProbes(model: IvfModel, v: Column): Column =
    column(IvfProbesExpr(expression(v), ModelBroadcast.of(model)))
}
