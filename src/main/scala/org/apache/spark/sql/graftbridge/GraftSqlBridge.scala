package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: converts between the public
  * `Column` API and Catalyst `Expression`s so graft's native expressions
  * can be exposed as normal columns. Lives under `org.apache.spark.sql`
  * purely for access; contains no logic.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
