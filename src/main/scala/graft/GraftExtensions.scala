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
        // a wrong arity must surface as a normal analyzer error, not a
        // bare IllegalArgumentException stack trace (ADVICE r05)
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        DotProduct(children.head, children(1))
      }))
  }
}
