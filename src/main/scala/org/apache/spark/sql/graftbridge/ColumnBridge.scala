package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 routes `Column` through ColumnNode, and the converters
  * (classic.ExpressionUtils) are `private[sql]`; this object lives under
  * the `org.apache.spark.sql` package so graft's native expressions (e.g.
  * UlidTimestampMs) can be placed into a Column directly instead of a
  * by-name function-registry lookup — which would break in sessions built
  * without graft's SparkSessionExtensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
