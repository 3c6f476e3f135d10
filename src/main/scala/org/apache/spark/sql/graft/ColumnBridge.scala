package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's custom Catalyst
  * expressions.  Spark 4 unified `Column` around ColumnNode and made
  * the converters `private[sql]`, so third-party expressions use the
  * conventional in-namespace shim (the same pattern extension
  * libraries use) — this file is the only code outside the `graft`
  * namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
