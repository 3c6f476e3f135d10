package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, NormalizeText}

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

  private def wrongArity(name: String, expected: Int, actual: Int): Nothing =
    // a wrong arity must surface as a normal analyzer error, not a
    // bare IllegalArgumentException stack trace (ADVICE r05)
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Registers a Column-composition function (the TextOps family) as a
    * SQL function: the builder re-expresses the incoming argument
    * expressions through the same `Column` tree the Scala API builds,
    * so SQL callers get the IDENTICAL (codegen'd, built-in-only) plan
    * — these are macro-style expansions, not UDFs.
    */
  private def injectColumnFn(
      ext: SparkSessionExtensions, name: String, usage: String, arity: Int)(
      build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
      (children: Seq[Expression]) => {
        if (children.length != arity) wrongArity(name, arity, children.length)
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.eagerExpression(build(children.map(ColumnBridge.column)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rules (operator-optimization batch, fixed point):
    // bit-identical rewrites only — see graft.plans.GraftRules
    ext.injectOptimizerRule(_ => graft.plans.GraftRules.CollapseNormalize)
    ext.injectOptimizerRule(_ => graft.plans.GraftRules.RewriteHofDotProduct)
    // whole-operator tier: the per-key top-k logical node plans to
    // the partial/final bounded-heap execs (graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
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
        if (children.length != 2) wrongArity("graft_dot", 2, children.length)
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(
        classOf[graft.functions.HllSketchAgg].getName, null, "graft_hll",
        "graft_hll(key) - HyperLogLog distinct-count AGGREGATE " +
          "(p=10 registers; returns struct(buckets_used, est_distinct)); " +
          "bit-equal to the SketchOps register-table formulation", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_hll", 1, children.length)
        graft.functions.HllSketchAgg(children.head, p = 10)
          .toAggregateExpression()
      }))
    injectColumnFn(ext, "graft_tokens",
      "graft_tokens(text) - whitespace tokens with empties dropped", 1)(
      args => graft.ops.TextOps.tokens(args.head))
    injectColumnFn(ext, "graft_bpe_estimate",
      "graft_bpe_estimate(text) - BPE-ish subword count estimate", 1)(
      args => graft.ops.TextOps.bpeTokenEstimate(args.head))
    injectColumnFn(ext, "graft_lang_id",
      "graft_lang_id(text) - function-word language-ID heuristic", 1)(
      args => graft.ops.TextOps.langId(args.head))
    injectColumnFn(ext, "graft_redact_pii",
      "graft_redact_pii(text) - scrub emails/IPs/SSNs/phone numbers", 1)(
      args => graft.ops.TextOps.redactPii(args.head))
    injectColumnFn(ext, "graft_dedup_paragraphs",
      "graft_dedup_paragraphs(text) - drop repeated paragraphs, keep first occurrences", 1)(
      args => graft.ops.TextOps.dedupParagraphs(args.head))
    injectColumnFn(ext, "graft_fingerprint",
      "graft_fingerprint(text) - stable 64-bit document fingerprint", 1)(
      args => graft.ops.TextOps.fingerprint64(args.head))
    injectColumnFn(ext, "graft_pseudonymize",
      "graft_pseudonymize(value, salt) - deterministic keyed surrogate " +
        "md5(salt ':' value); same (salt, value) -> same token across " +
        "tables so joins survive; NULL value stays NULL", 2)(
      args => org.apache.spark.sql.functions.when(args.head.isNull,
          org.apache.spark.sql.functions.lit(null).cast("string"))
        .otherwise(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws(":",
            args(1).cast("string"), args.head.cast("string")))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NormalizeText].getName, null, "graft_nfc",
        "graft_nfc(text) - Unicode NFC normalization (canonical " +
          "composition); normalize dedup keys BEFORE hashing", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_nfc", 1, children.length)
        NormalizeText(children.head, compat = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[NormalizeText].getName, null, "graft_nfkc",
        "graft_nfkc(text) - Unicode NFKC normalization (compatibility " +
          "fold: ligatures, full-width forms) - the aggressive dedup key", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_nfkc", 1, children.length)
        NormalizeText(children.head, compat = true)
      }))
  }
}
