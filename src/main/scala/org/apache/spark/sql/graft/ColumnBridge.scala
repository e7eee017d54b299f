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
}
