package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C4/Gopher-style per-document quality metrics, fused into ONE
  * codegen'd byte scan of the text:
  *
  *   struct(n_chars_m, n_words, avg_word_len, stopword_ratio,
  *          alpha_ratio, punct_ratio, quality_score)
  *
  * Semantics are exactly TextOps' composed form (pinned by the
  * q_quality_score / q_quality_classifier oracles and the parity
  * spec): whitespace tokens are maximal runs of non-`\s` bytes (Java
  * `\s` = ASCII tab/LF/VT/FF/CR/space — no Unicode classes), n_chars
  * is the CHARACTER count (`length()`), alpha counts `[a-zA-Z]`,
  * punct counts `[.,;:!?'"]`, stopword hits are exact-match tokens
  * from the English function-word table, and the composite score is
  * the mean of the four gates (5 ≤ words ≤ 100000, 2 ≤ avg word len
  * ≤ 12, stop ratio > 0.01, alpha ratio > 0.6).
  *
  * Why an expression: the composed form re-tokenizes per metric under
  * filter pushdown (the GramRepetition lesson — a `quality_score >=
  * 0.5` gate inlines the whole chain into the Filter), and its
  * stopword count is an interpreted higher-order `filter` over an
  * `InSet` per token.  Every class test here is a byte compare
  * (UTF-8 continuation bytes ≥ 0x80 can never alias the ASCII
  * classes), so the scan does no per-token allocation at all.
  */
case class QualityTextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QualityTextStats.schema
  // null TEXT does not null the struct: the composed form's
  // `when(...).otherwise(0.0)` ratio branches yield
  // (null, null, 0, 0, 0, 0, 0) for a null document, and the fused
  // form matches it exactly (the count fields alone stay null)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quality_text_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) QualityTextStats.NullTextRow
    else QualityTextStats.compute(v.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cls = QualityTextStats.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${childGen.code}
        InternalRow ${ev.value} = ${childGen.isNull} ?
          $cls.nullTextRow() : $cls.compute(${childGen.value});
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): QualityTextStats = copy(child = newChild)
}

object QualityTextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars_m", IntegerType, nullable = true), // null for null text
    StructField("n_words", IntegerType, nullable = true),
    StructField("avg_word_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false)))

  /** The composed form's null-text row: counts null (length/size of a
    * null chain), ratios and score 0.0 (the `otherwise` branches).
    */
  private val NullTextRow: InternalRow =
    new GenericInternalRow(Array[Any](null, null, 0.0, 0.0, 0.0, 0.0, 0.0))

  def nullTextRow(): InternalRow = NullTextRow

  // TextOps.langFunctionWords("en"), as UTF-8 bytes for alloc-free
  // token comparison (all ASCII; longest is 4 bytes)
  private val StopWords: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "to", "is", "in", "it", "that")
      .map(_.getBytes("US-ASCII"))

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // space, \t \n \x0B \f \r

  private def isStopword(bytes: Array[Byte], from: Int, len: Int): Boolean = {
    var w = 0
    while (w < StopWords.length) {
      val sw = StopWords(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && bytes(from + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  /** Static helper the generated code calls — one pass over the
    * UTF-8 bytes, no per-token allocation.
    */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var chars = 0
    var alpha = 0
    var punct = 0
    var words = 0
    var stop = 0
    var tokStart = -1
    var i = 0
    while (i < n) {
      val b = bytes(i)
      // UTF-8 continuation bytes (10xxxxxx) don't start a character
      if ((b & 0xc0) != 0x80) chars += 1
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alpha += 1
      else if (b == '.' || b == ',' || b == ';' || b == ':' ||
        b == '!' || b == '?' || b == '\'' || b == '"') punct += 1
      if (isWs(b)) {
        if (tokStart >= 0) {
          words += 1
          if (isStopword(bytes, tokStart, i - tokStart)) stop += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) {
      words += 1
      if (isStopword(bytes, tokStart, n - tokStart)) stop += 1
    }
    val avgWordLen =
      if (words > 0) (chars - (words - 1)).toDouble / words else 0.0
    val stopRatio = if (words > 0) stop.toDouble / words else 0.0
    val alphaRatio = if (chars > 0) alpha.toDouble / chars else 0.0
    val punctRatio = if (chars > 0) punct.toDouble / chars else 0.0
    val score =
      ((if (words >= 5 && words <= 100000) 1.0 else 0.0) +
        (if (avgWordLen >= 2.0 && avgWordLen <= 12.0) 1.0 else 0.0) +
        (if (stopRatio > 0.01) 1.0 else 0.0) +
        (if (alphaRatio > 0.6) 1.0 else 0.0)) / 4.0
    new GenericInternalRow(Array[Any](
      chars, words, avgWordLen, stopRatio, alphaRatio, punctRatio, score))
  }
}
