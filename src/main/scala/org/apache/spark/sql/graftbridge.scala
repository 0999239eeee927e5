package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql-private Column <-> Expression converters for
  * graft's custom Catalyst expressions (the standard extension-library
  * technique: Spark 4 moved these behind `private[sql]`).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
