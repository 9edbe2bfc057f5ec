package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge to `private[sql]` Spark internals that custom Catalyst
  * expressions need: the Column<->Expression converters and the input-type
  * specification vocabulary. Lives under `org.apache.spark.sql` purely for
  * access; contains no logic. */
object SparkShim {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def typeCollection(types: AbstractDataType*): AbstractDataType =
    org.apache.spark.sql.types.TypeCollection(types: _*)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
