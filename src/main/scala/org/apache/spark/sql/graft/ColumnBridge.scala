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

  /** DataFrame over a custom LogicalPlan (the whole-operator tier:
    * graft.plans.TopKPerKey) — `Dataset.ofRows` is `private[sql]`,
    * reached through this in-namespace shim like the converters.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** EAGER Column → Expression conversion.  `expression` wraps the
    * node in a lazy `ColumnNodeExpression`, which is fine inside a
    * Dataset transformation (the converter runs at plan construction)
    * but NOT as a `FunctionBuilder` return value: the analyzer treats
    * the wrapper as resolved, it survives to codegen, and codegen
    * rejects it as Unevaluable.  SQL-function expansion therefore
    * converts the whole tree up front.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
