package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions (Spark 4
  * moved Column onto ColumnNode; extensions that define native Catalyst
  * expressions need this two-liner). Standard pattern for Spark extension
  * libraries; nothing else in the engine lives outside the graft package.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
