package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish subword count estimate as one codegen'd byte scan —
  * exactly `size(regexp_extract_all(c, "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))`
  * (TextOps' composed form, kept there as the spec-parity reference):
  * the match count of that pattern is the number of maximal ASCII
  * letter runs, plus maximal digit runs, plus every other
  * non-whitespace CHARACTER matched singly (each multi-byte UTF-8
  * character is one such match — count lead bytes, skip continuation
  * bytes; Java `\s` is ASCII-only, so every class test is a byte
  * compare).
  *
  * Why an expression: the token estimate rides the selection and
  * packing hot paths (budget select, token-budget packing, the
  * `graft_bpe_token_estimate` SQL function), and `regexp_extract_all`
  * allocates a string per match — tens of millions of single-use
  * allocations per corpus pass — just to be counted.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${BpeTokenCount.getClass.getName.stripSuffix("$")}.count($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

object BpeTokenCount {
  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var c = 0
    var i = 0
    var run = 0 // 0 = none, 1 = letters, 2 = digits
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        if (run != 1) { c += 1; run = 1 }
      } else if (b >= '0' && b <= '9') {
        if (run != 2) { c += 1; run = 2 }
      } else {
        run = 0
        if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) () // \s: skip
        else if ((b & 0xc0) == 0x80) () // UTF-8 continuation byte
        else c += 1 // ASCII symbol or multi-byte lead: one char match
      }
      i += 1
    }
    c
  }
}
