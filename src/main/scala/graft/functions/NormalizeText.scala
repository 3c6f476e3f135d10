package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup keys — NFC (or NFKC)
  * Unicode normalization as a native codegen'd expression.  Exact-
  * and hash-dedup both compare BYTES, so "café" composed and "café"
  * with a combining accent are different keys until normalized; at
  * corpus scale the un-normalized variants of the same document leak
  * through every hash-based dedup family.  Normalize FIRST, then
  * hash.
  *
  * Spark has no built-in Unicode-normalize function (it is not
  * expressible by composition either), so this is the
  * custom-`Expression` tier of the operator preference order: the
  * JDK's `java.text.Normalizer` called once per row from
  * whole-stage-generated code — no UDF serialization, null-safe, and
  * the fast path (`isNormalized`, the overwhelmingly common case for
  * already-clean corpora) avoids allocating a new string entirely.
  *
  * `compat = true` selects NFKC (compatibility decomposition: also
  * folds ligatures, full-width forms, superscripts — the aggressive
  * dedup-key choice); default NFC is the conservative canonical form.
  */
case class NormalizeText(child: Expression, compat: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (compat) "graft_nfkc" else "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  private def form: Normalizer.Form =
    if (compat) Normalizer.Form.NFKC else Normalizer.Form.NFC

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], compat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${NormalizeText.getClass.getName.stripSuffix("$")}" +
        s".normalize($c, $compat)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

object NormalizeText {
  /** Static helper the generated code calls — one virtual call per
    * row, no closure/UDF plumbing.  `isNormalized` short-circuits the
    * (typical) already-normalized row without allocating.
    */
  def normalize(s: UTF8String, compat: Boolean): UTF8String = {
    val form = if (compat) Normalizer.Form.NFKC else Normalizer.Form.NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
