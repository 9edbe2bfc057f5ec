package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd distance kernels over `ARRAY<FLOAT|DOUBLE>`
  * columns. These are the perf upgrade over [[VectorFunctions]]'s
  * higher-order-function forms (SURVEY.md §4 item 2): a single fused loop
  * per row, no intermediate array allocation, no cast of FLOAT input
  * (reads `getFloat`/`getDouble` straight out of Tungsten's ArrayData,
  * same role as the reference's BLAS calls, lsh/helpers.go:138-145).
  *
  * Null semantics: null if either input is null (standard BinaryExpression
  * null-intolerant behavior). Both arrays are assumed equal length (the
  * engine's vector columns have fixed dimensionality, as in the reference
  * where dims derive from the data, lsh/hasher.go:104).
  */
private[graft] trait VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  // Nullable even for non-null children: mismatched vector lengths yield
  // NULL (consistent with the zip_with-based forms, where the shorter side
  // is null-padded and the fold returns NULL).
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Interpreted-path element read. */
  protected def getElem(e: Expression, a: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) a.getFloat(i).toDouble else a.getDouble(i)

  /** Codegen element read. */
  protected def genGet(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** sqrt(sum((a-b)^2)) — reference L2 metric (lsh/helpers.go:133-149). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_dist"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else {
      var s = 0.0; var i = 0
      while (i < n) { val d = getElem(left, a, i) - getElem(right, b, i); s += d * d; i += 1 }
      math.sqrt(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${genGet(left, a, i)} - ${genGet(right, b, i)};
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = Math.sqrt($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum(a[i]*b[i]). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else {
      var s = 0.0; var i = 0
      while (i < n) { s += getElem(left, a, i) * getElem(right, b, i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${genGet(left, a, i)} * ${genGet(right, b, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** 1 - dot/(|a||b|), zero-norm guard -> 1.0, clamp-to-0 below tol — one
  * fused pass (reference: lsh/helpers.go:219-234, tol helpers.go:13-15). */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_dist"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getElem(left, a, i); val y = getElem(right, b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val tol = VectorFunctions.Tol
    if (math.sqrt(na) <= tol || math.sqrt(nb) <= tol) 1.0
    else {
      val d = 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      if (d < tol) 0.0 else d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("d")
      val tol = VectorFunctions.Tol
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = ${genGet(left, a, i)};
         |    double $y = ${genGet(right, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (Math.sqrt($na) <= $tol || Math.sqrt($nb) <= $tol) {
         |    ${ev.value} = 1.0;
         |  } else {
         |    double $d = 1.0 - $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |    ${ev.value} = ($d < $tol) ? 0.0 : $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sqrt(sum(x^2)) of one vector. */
case class VecNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(av: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double $s = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $s += $x * $x; }
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Column-API entry points for the codegen kernels. */
object exprs {
  import SparkShim.{column, expression}
  def l2DistNative(a: Column, b: Column): Column = column(L2Distance(expression(a), expression(b)))
  def cosineDistNative(a: Column, b: Column): Column = column(CosineDistance(expression(a), expression(b)))
  def dotNative(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vecNormNative(a: Column): Column = column(VecNorm(expression(a)))
}
