package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column↔Expression conversions, which are
  * private[sql] in Spark 4 (Column no longer exposes .expr). Living in a
  * subpackage of org.apache.spark.sql grants access — the standard
  * pattern for Catalyst-level extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
