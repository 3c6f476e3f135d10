package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** The engine's `SparkSessionExtensions` entry point — makes the
  * custom codegen'd expressions first-class SQL functions, so pure-SQL
  * users (thriftserver, `spark.sql(...)`, SQL files) reach them
  * without touching the Scala API:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions       // config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  *
  *   SELECT graft_dot(embedding, query_vec) AS dot FROM vecs
  * }}}
  *
  * `graft_dot` resolves to [[graft.functions.DotProduct]] — the
  * whole-stage-codegen dot product (double accumulation, HOF-identical
  * null semantics) that replaces the interpreted
  * `aggregate(zip_with(...))` form on every pair-heavy similarity
  * path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[DotProduct].getName,
        null,
        "graft_dot",
        "graft_dot(a, b) - dot product of two float/double arrays " +
          "with double accumulation; NULL on null/length-mismatched input",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot(a, b) takes exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
  }
}
