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

  /** Parameter literals (k, w, n, …) must be foldable INT literals —
    * they size compile-time structures inside the fused expressions,
    * so a per-row value cannot work; fail as the analyzer would.
    */
  private def litInt(name: String, param: String, e: Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
        v: Int, org.apache.spark.sql.types.IntegerType) => v
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$name`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    }

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
    // ---- the fused-expression text family (r12 codegen'd scans) ----
    ext.injectFunction((
      FunctionIdentifier("graft_quality"),
      new ExpressionInfo(
        classOf[graft.functions.QualityTextStats].getName, null,
        "graft_quality",
        "graft_quality(text) - seven quality metrics in one byte scan: " +
          "struct(n_chars_m, n_words, avg_word_len, stopword_ratio, " +
          "alpha_ratio, punct_ratio, quality_score)", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_quality", 1, children.length)
        graft.functions.QualityTextStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(
        classOf[graft.functions.WinnowFingerprint].getName, null,
        "graft_winnow",
        "graft_winnow(text, k, w) - winnowing fingerprint (Schleimer " +
          "et al. SIGMOD'03): distinct window-of-w minima over char " +
          "k-gram xxhash64 values, first-occurrence order; k and w " +
          "must be INT literals", ""),
      (children: Seq[Expression]) => {
        if (children.length != 3) wrongArity("graft_winnow", 3, children.length)
        graft.functions.WinnowFingerprint(children.head,
          litInt("graft_winnow", "k", children(1)),
          litInt("graft_winnow", "w", children(2)), portable = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(
        classOf[graft.functions.WordNgramArray].getName, null,
        "graft_word_ngrams",
        "graft_word_ngrams(text, n) - space-joined word n-grams of the " +
          "whitespace tokens, short-input clamp to one (truncated) " +
          "gram; n must be an INT literal", ""),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArity("graft_word_ngrams", 2, children.length)
        graft.functions.WordNgramArray(
          graft.functions.TokensArray(children.head),
          litInt("graft_word_ngrams", "n", children(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(
        classOf[graft.functions.GramRepetition].getName, null,
        "graft_repetition",
        "graft_repetition(text, n) - intra-document n-gram repetition: " +
          "struct(n_grams, n_distinct, dup_gram_frac, dup_char_frac); " +
          "n must be an INT literal", ""),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArity("graft_repetition", 2, children.length)
        graft.functions.GramRepetition(
          graft.functions.TokensArray(children.head),
          litInt("graft_repetition", "n", children(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[graft.functions.MinhashSignature].getName, null,
        "graft_minhash",
        "graft_minhash(text, shingle_size, num_hashes) - whole-chain " +
          "MinHash signature: word shingles, xxhash64 mod 2^31-1 base, " +
          "fused minima (deterministic LCG hash family); INT literals", ""),
      (children: Seq[Expression]) => {
        if (children.length != 3) wrongArity("graft_minhash", 3, children.length)
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.eagerExpression(
          graft.ops.DedupOps.minhashSignatureOfText(
            ColumnBridge.column(children.head),
            litInt("graft_minhash", "shingle_size", children(1)),
            litInt("graft_minhash", "num_hashes", children(2))))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[graft.functions.SimhashBits].getName, null,
        "graft_simhash",
        "graft_simhash(text) - 64-bit SimHash of the whitespace tokens " +
          "(seed-42 xxhash64 per token, per-bit majority vote) in one " +
          "shuffle-free byte scan; NULL for token-less text", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_simhash", 1, children.length)
        graft.functions.SimhashBits(children.head, nBits = 64, portable = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_60"),
      new ExpressionInfo(
        classOf[graft.functions.Md5Hash60].getName, null,
        "graft_md5_60",
        "graft_md5_60(v) - the engine's portable 60-bit hash: the first " +
          "15 hex chars of md5 as a BIGINT (replayable in any engine " +
          "with md5 + hex parsing)", ""),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArity("graft_md5_60", 1, children.length)
        graft.functions.Md5Hash60(children.head)
      }))
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
