package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4.x moved `Column` to a ColumnNode facade; wrapping a raw
  * Catalyst [[Expression]] into a [[Column]] (the old `new Column(expr)`)
  * now lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim lives inside the `org.apache.spark.sql`
  * package purely to re-export those two conversions for graft's custom
  * expressions (public Spark API surface otherwise).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
