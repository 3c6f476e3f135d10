package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as one codegen'd byte scan — exactly
  * `filter(split(c, "\\s+"), t => t =!= "")` (TextOps' composed form,
  * kept there as the parity-spec reference): tokens are maximal runs
  * of non-whitespace bytes, where whitespace is Java regex `\s` =
  * ASCII tab/LF/VT/FF/CR/space (no Unicode classes — multi-byte UTF-8
  * bytes are ≥ 0x80 and can never alias them), and the split's
  * leading empty string is exactly what the filter drops.
  *
  * Why an expression: `tokens` is the engine's most-used function —
  * every text operator starts with it — and the regex engine walks a
  * DFA per char plus allocates the `split` array AND the filtered
  * copy.  The scan emits each token as a zero-copy UTF8String view
  * over the source bytes.
  */
case class TokensArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokensArray.tokenize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${TokensArray.getClass.getName.stripSuffix("$")}.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokensArray = copy(child = newChild)
}

object TokensArray {
  def tokenize(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      math.min(n / 5 + 1, 64))
    var i = 0
    var start = -1
    while (i < n) {
      val b = bytes(i)
      if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) {
        if (start >= 0) { out += UTF8String.fromBytes(bytes, start, i - start); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out.toArray[Any])
  }
}
