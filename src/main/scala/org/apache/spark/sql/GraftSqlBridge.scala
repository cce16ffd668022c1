package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor bridge: Spark 4 made Column<->Expression conversion
  * `private[sql]` (`classic.ExpressionUtils`). Custom Catalyst expressions
  * (graft.functions._) need exactly these two conversions to expose a
  * `Column` API — the standard extension-library pattern.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) LogicalPlan as a DataFrame — needed to hand a
    * custom logical operator (graft.plans._) back to the public API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
