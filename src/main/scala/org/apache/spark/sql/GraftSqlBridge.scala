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
}
