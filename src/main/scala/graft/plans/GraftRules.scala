package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{DotProduct, NormalizeText}

/** Optimizer rules injected by [[graft.GraftExtensions]] via
  * `injectOptimizerRule` — they run inside Catalyst's operator
  * optimization batch (fixed point, post-analysis), so they compose
  * with the built-in rules (`SimplifyCasts` may fire before or after;
  * both shapes are matched).
  *
  * These are REWRITES, not new semantics: each rule replaces an
  * expression tree with a cheaper tree that is documented (and
  * spec-pinned) to produce bit-identical results, so they are safe on
  * every plan, including pure-SQL sessions that never touch the Scala
  * API.
  */
object GraftRules {

  /** Collapses nested Unicode normalizations to a single pass.
    *
    * Soundness: NFC and NFKC are idempotent, NFKC output is already
    * canonically composed (so `NFC∘NFKC = NFKC`), and
    * `NFKC∘NFC = NFKC` (compatibility decomposition subsumes the
    * canonical one).  Hence `outer(inner(x)) = (inner.compat ||
    * outer.compat)(x)` for every combination — the collapsed form
    * keeps the stronger fold.
    *
    * Matters in practice because normalize-before-hash is the dedup
    * key discipline: pipeline stages compose, and a view that already
    * normalized its text gets re-normalized by the dedup stage.  One
    * `Normalizer` pass per row instead of two (each pass allocates
    * when the input is not already normalized).
    */
  object CollapseNormalize extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case NormalizeText(NormalizeText(child, inner), outer) =>
          NormalizeText(child, inner || outer)
      }
  }

  /** Rewrites the higher-order-function dot product
    *
    * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
    *
    * (with the element multiply performed in DOUBLE — raw double
    * arrays or explicit casts) into the codegen'd
    * [[graft.functions.DotProduct]].  Spark evaluates higher-order
    * array functions interpreted — per-element lambda dispatch — so on
    * pair-heavy similarity paths the HOF form pays an order of
    * magnitude over the fused loop.  `DotProduct` is documented (and
    * OpsSpec-pinned) to match the HOF form bit-exactly: same IEEE
    * fold order from +0.0, same NULL-on-mismatch/null-element
    * semantics.  The rewrite makes that fast path automatic for SQL
    * users who write the portable HOF spelling, instead of requiring
    * them to know about `graft_dot`.
    *
    * The match is deliberately conservative; anything else (float
    * multiply, non-zero seed, extra lambda structure) is left alone:
    *  - zero must be literal +0.0 double (`-0.0` would flip signed
    *    zeros; a foldable non-literal changes nothing and is folded by
    *    `ConstantFolding` first anyway),
    *  - the multiply must be double-typed with each operand one of the
    *    zip lambda's own variables, optionally under a cast to double
    *    (the only shape whose rounding matches cast-then-multiply),
    *  - the merge must be `acc + v` over the merge lambda's own
    *    variables (either order — IEEE addition of non-NaN doubles is
    *    commutative, and NaN results stay NaN under both orders),
    *  - the finish lambda must be the identity.
    */
  object RewriteHofDotProduct extends Rule[LogicalPlan] {

    private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }

    /** The operand is `v` itself (already double) or `CAST(v AS
      * DOUBLE)` — the two rounding-equivalent spellings of
      * "element as double".
      */
    private def doubleOf(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
      case c: Cast if c.dataType == DoubleType =>
        c.child match {
          case v: NamedLambdaVariable => Some(v)
          case _ => None
        }
      case _ => None
    }

    private def isPlusZeroDouble(e: Expression): Boolean = e match {
      case Literal(v: Double, DoubleType) =>
        java.lang.Double.doubleToRawLongBits(v) == 0L
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case ArrayAggregate(
              ZipWith(a, b,
                LambdaFunction(Multiply(ml, mr, _), Seq(
                  x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
              zero,
              LambdaFunction(Add(al, ar, _), Seq(
                acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
              LambdaFunction(fin: NamedLambdaVariable, Seq(
                finArg: NamedLambdaVariable), _))
            if isFloatOrDoubleArray(a) && isFloatOrDoubleArray(b) &&
              isPlusZeroDouble(zero) &&
              // multiply: {x, y} each as-double, either order
              (for { l <- doubleOf(ml); r <- doubleOf(mr) } yield
                Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId))
                .getOrElse(false) &&
              // merge: acc + v over the merge lambda's own vars
              (Seq(al, ar).forall {
                case nv: NamedLambdaVariable =>
                  nv.exprId == acc.exprId || nv.exprId == v.exprId
                case _ => false
              } && Seq(al, ar).collect {
                case nv: NamedLambdaVariable => nv.exprId
              }.toSet == Set(acc.exprId, v.exprId)) &&
              fin.exprId == finArg.exprId =>
          DotProduct(a, b)
      }
  }
}
