package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made the Column <-> Expression converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so custom native
  * expressions need this one-file shim inside the sql package — the same
  * technique Spark connector libraries use.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
