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

  /** Block until the listener bus has delivered all pending events — makes
    * QueryExecutionListener-based metric collection deterministic. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession, timeoutMs: Long = 10000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
