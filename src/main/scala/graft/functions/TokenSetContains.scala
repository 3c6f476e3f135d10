package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Constant-set membership as a codegen'd int (1 = member, 0 = not) —
  * the demotion key of the prefix-filtered Jaccard join's token order
  * (DedupOps.tokenJaccardPairs): globally frequent tokens sort AFTER
  * everything else so document prefixes are made of RARE tokens, the
  * frequency-ordered-prefix rule of the AllPairs literature (Bayardo
  * et al., WWW'07 §3.1).
  *
  * Why an expression: the set is ~2¹⁰ strings, so per-token membership
  * must be O(1) — `array_contains` over a literal array and
  * `element_at` over a literal map both scan linearly in Spark, and a
  * broadcast join would force the tokens through a shuffle.  The
  * hash-set reference ships once per task via the codegen reference
  * array (same constant-tensor pattern as NearestCells/PqCodes).
  */
case class TokenSetContains(child: Expression, tokens: Array[UTF8String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_set_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.length * 2)
    tokens.foreach(s.add)
    s
  }

  def contains(s: UTF8String): Int = if (set.contains(s)) 1 else 0

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenSet", this, classOf[TokenSetContains].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.contains($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetContains = copy(child = newChild)
}
