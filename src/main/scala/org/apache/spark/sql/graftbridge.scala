package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql-private Column <-> Expression converters for
  * graft's custom Catalyst expressions (the standard extension-library
  * technique: Spark 4 moved these behind `private[sql]`).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * Dataset (its plan is a [[execution.LogicalRDD]] over the persisted
    * internal-row RDD; `Dataset.unpersist` only covers `cache()`d plans).
    * No-op for non-checkpointed plans. Iterative operators (connected
    * components, k-means) call this on round N-1 once round N is
    * materialized — otherwise every round's blocks live until the
    * session ends.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
