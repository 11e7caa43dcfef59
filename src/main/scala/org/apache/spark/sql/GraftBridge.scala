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

  /** Full ColumnNode -> Expression conversion (vs [[expression]]'s opaque
    * wrapper): required when a functions-API Column tree must become a real
    * (analyzer-resolvable) expression — e.g. FunctionRegistry builders that
    * expand to built-in compositions.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
