package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for the `private[sql]` Column <-> Expression converters (the
  * supported pattern for libraries contributing native Catalyst
  * expressions without a fork; Spark 4 moved Column internals behind
  * ColumnNode so `new Column(expr)` no longer exists).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
