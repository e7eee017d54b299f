package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's sql-package-private Column↔Expression converters
  * (Spark 4 routes Columns through ColumnNode; `ExpressionUtils` is
  * `private[sql]`). Living under `org.apache.spark.sql` is the sanctioned
  * extension-point pattern for libraries that ship native Catalyst
  * expressions without a SparkSessionExtensions registration. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the seam a library needs to offer FIRST-CLASS
    * custom logical operators (graft.plans.AsOfJoin) and to lower them
    * back to Catalyst compositions inside an optimizer rule. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until the async listener bus has DELIVERED every queued event
    * (`LiveListenerBus.waitUntilEmpty`, `private[spark]`) — the exact
    * drain barrier listener-tallying harness code needs; snapshot-polling
    * the tallies instead can declare victory during a bus stall and read
    * stale counts. */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
