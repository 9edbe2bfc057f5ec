package graft.ann.ivfpq

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.graftshim.SparkShim.AbstractDataType
import org.apache.spark.sql.types._

/** Per-(query, probed-cell) RESIDUAL ADC tables — the IVF-PQ twist on
  * [[graft.ann.pq.PqAdcTables]]: because codes quantize the residual
  * `v - centroid(cell)`, the query-side lookup table differs per probed
  * cell (`q - centroid(cell)` vs each codebook centroid).
  *
  * Tables are computed LAZILY ON EXECUTORS, not precomputed driver-side:
  * the eager form is nQueries x nProbe x m x k doubles — ~420 MB at just
  * 100 queries x 128 probes x 16x256, which OOM'd the task-binary ship at
  * the 1M-corpus probe and grows linearly in query count. What ships
  * instead is the model + the (normalized) query vectors (nQueries x dims
  * doubles — KBs to low MBs), and each (query_id, cell) table is built on
  * first touch and memoized under the composite `(query_id, cell)` key —
  * collision-free for the FULL query-id range (a packed
  * `query_id * nCells + cell` long would silently alias ids ~2^64/nCells
  * apart and serve wrong residual tables). The provider itself rides as a
  * broadcast handle ([[graft.ann.ModelBroadcast]]), so ONE instance — and
  * therefore one shared cache — exists per executor JVM rather than one
  * per task. A table costs m x k x subDim mult-adds to build — amortized
  * over every candidate in that (query, cell) bucket, with hit rate kept
  * high by `searchAll`'s cell-clustered scan — and the cache clears
  * wholesale if it ever exceeds `maxCacheEntries` (tables are cheap to
  * rebuild, so eviction can be crude; the JVM-wide bound of
  * maxCacheEntries x m x k doubles is what matters at 100 TB).
  */
final class IvfPqAdcTables(model: IvfPqModel,
                           queryVecs: Array[(Long, Array[Double])],
                           maxCacheEntries: Int = 4096)
    extends Serializable {

  private val qv = {
    val m = new java.util.HashMap[java.lang.Long, Array[Double]](queryVecs.length * 2)
    queryVecs.foreach { case (id, v) => m.put(id, v) }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[IvfPqAdcTables.Key, Array[Array[Double]]]()

  private def tableFor(queryId: Long, cell: Int): Array[Array[Double]] = {
    val key = IvfPqAdcTables.Key(queryId, cell)
    val hit = cache.get(key)
    if (hit != null) return hit
    val q = qv.get(queryId)
    if (q == null)
      throw new IllegalArgumentException(s"no query vector for query_id $queryId")
    val t = model.pq.adcTable(model.residual(q, cell))
    if (cache.size >= maxCacheEntries) cache.clear()
    cache.put(key, t)
    t
  }

  /** sqrt of the summed per-subvector lookups for one candidate in `cell`. */
  def dist(queryId: Long, cell: Int, codes: ArrayData): Double = {
    val t = tableFor(queryId, cell)
    var s = 0.0
    var i = 0
    while (i < t.length) { s += t(i)(codes.getInt(i)); i += 1 }
    math.sqrt(s)
  }
}

object IvfPqAdcTables {
  /** Composite memoization key: collision-free over the full Long
    * query-id range (unlike a `query_id * nCells + cell` pack). */
  final case class Key(queryId: Long, cell: Int)
}

/** STRUCT<cell INT, codes ARRAY<INT>> of a vector: one argmin-centroid
  * pass picks the cell, then the residual is PQ-encoded — a single
  * native-codegen expression so the per-row cost is one cell argmin plus
  * one residual encode, with no UDF encoder round-trip and no second
  * argmin for the cell column (same touches-every-row standard as
  * LshHashesExpr / IvfCellExpr / PqEncodeExpr). */
case class IvfPqEncodeExpr(child: Expression, bcast: Broadcast[IvfPqModel])
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "ivfpq_encode"

  @transient private lazy val model: IvfPqModel = bcast.value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShim.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = IvfPqExpressions.EncodedType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(av: Any): Any =
    model.encodeRowData(av.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bref = ctx.addReferenceObj("ivfPqBcast", bcast,
      classOf[Broadcast[IvfPqModel]].getName)
    val cls = classOf[IvfPqModel].getName
    val mref = ctx.addMutableState(cls, "ivfPqModel", v => s"$v = ($cls) $bref.value();")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mref.encodeRowData($a, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** DOUBLE approximate L2 distance of (query_id BIGINT, cell INT,
  * codes ARRAY<INT>) via the broadcast residual ADC tables: m lookups. */
case class IvfPqAdcDistExpr(first: Expression, second: Expression,
                            third: Expression, bcast: Broadcast[IvfPqAdcTables])
    extends TernaryExpression with ExpectsInputTypes {

  override def prettyName: String = "ivfpq_adc_dist"

  @transient private lazy val tables: IvfPqAdcTables = bcast.value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(qid: Any, cell: Any, codes: Any): Any =
    tables.dist(qid.asInstanceOf[Long], cell.asInstanceOf[Int],
      codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bref = ctx.addReferenceObj("ivfPqTablesBcast", bcast,
      classOf[Broadcast[IvfPqAdcTables]].getName)
    val cls = classOf[IvfPqAdcTables].getName
    val tref = ctx.addMutableState(cls, "ivfPqTables", v => s"$v = ($cls) $bref.value();")
    nullSafeCodeGen(ctx, ev, (q, c, cs) => s"${ev.value} = $tref.dist($q, $c, $cs);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object IvfPqExpressions {
  import SparkShim.{column, expression}

  val EncodedType: StructType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def ivfPqEncode(model: IvfPqModel, v: Column): Column =
    column(IvfPqEncodeExpr(expression(v), graft.ann.ModelBroadcast.of(model)))

  def ivfPqAdcDist(tables: IvfPqAdcTables, queryId: Column, cell: Column,
                   codes: Column): Column =
    column(IvfPqAdcDistExpr(expression(queryId), expression(cell),
      expression(codes), graft.ann.ModelBroadcast.of(tables)))
}
