package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style word-n-gram repetition metrics, fused into ONE
  * codegen'd pass over the token array:
  *
  *   struct(n_grams, uniq_grams, dup_gram_frac, dup_char_frac)
  *
  * Semantics are exactly TextOps' higher-order-function chain
  * (`wordNgramsOf` → size/array_distinct/array_sort/zip_with/aggregate,
  * pinned by TextSpec + the q_repetition_stats oracle): overlapping
  * n-grams with the short-document clamp (max(len−n+1, 1) windows, the
  * final windows truncated, a token-less doc yielding one empty gram),
  * `dup_gram_frac = 1 − distinct/total`, and `dup_char_frac` charging
  * every gram that equals its predecessor in the SORTED gram sequence
  * (binary UTF8 order — the same ordering `array_sort` uses), null
  * when the grams carry zero characters.
  *
  * Why an expression and not the composed form: the composed chain is
  * ~7 interpreted higher-order nodes (all `CodegenFallback`), and a
  * quality-gate filter on its output gets PUSHED BELOW the projection
  * by Catalyst with the whole chain inlined per metric — measured at
  * sf10: 7.5 s unfiltered → 70.7 s with the filter, a 9.4× blowup of
  * pure re-evaluation.  As one expression the filter inlines a single
  * compiled pass (tokenize + this), so the pushdown costs what it
  * should.  The HOF chain stays in TextOps as the spec-parity
  * reference implementation.
  */
case class GramRepetition(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = GramRepetition.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gram_repetition"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GramRepetition.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GramRepetition.getClass.getName.stripSuffix("$")}.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): GramRepetition = copy(child = newChild)
}

object GramRepetition {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("uniq_grams", LongType, nullable = false),
    StructField("dup_gram_frac", DoubleType, nullable = true),
    StructField("dup_char_frac", DoubleType, nullable = true)))

  private val Space = UTF8String.fromString(" ")

  /** The overlapping word-n-gram sequence with TextOps.wordNgramsOf's
    * exact clamp semantics: max(len−n+1, 1) windows, the final windows
    * truncated at the array end, a token-less input yielding one empty
    * gram, null tokens skipped like `concat_ws`.  Shared by
    * [[GramRepetition]] and [[WordNgramArray]].
    */
  private[functions] def buildGrams(toks: ArrayData, n: Int): Array[UTF8String] = {
    val len = toks.numElements()
    val w = math.max(len - (n - 1), 1)
    val grams = new Array[UTF8String](w)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < w) {
      // slice(toks, i+1, n) with the end clamp
      val end = math.min(i + n, len)
      var k = 0
      var j = i
      while (j < end) {
        val t = toks.getUTF8String(j)
        if (t != null) { parts(k) = t; k += 1 }
        j += 1
      }
      grams(i) =
        if (k == 0) UTF8String.EMPTY_UTF8
        else if (k == 1) parts(0)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(parts, 0, k): _*)
      i += 1
    }
    grams
  }

  /** Static helper the generated code calls: builds the overlapping
    * gram sequence once, then distinct-counts (open-addressed via
    * java.util.HashSet — UTF8String hashes by content) and
    * sorted-neighbor char-charges in the same pass structure the HOF
    * chain pins.
    */
  def compute(toks: ArrayData, n: Int): InternalRow = {
    val grams = buildGrams(toks, n)
    val w = grams.length
    var totalChars = 0L
    val seen = new java.util.HashSet[UTF8String](w * 2)
    var i = 0
    while (i < w) {
      totalChars += grams(i).numChars()
      seen.add(grams(i))
      i += 1
    }
    val uniq = seen.size.toLong
    var dupChars = 0L
    if (w >= 2) {
      val sorted = grams.clone()
      java.util.Arrays.sort(sorted.asInstanceOf[Array[Object]])
      i = 1
      while (i < w) {
        if (sorted(i) == sorted(i - 1) || sorted(i).equals(sorted(i - 1)))
          dupChars += sorted(i).numChars()
        i += 1
      }
    }
    val gramFrac: Any = (w - uniq).toDouble / w
    val charFrac: Any =
      if (totalChars > 0) dupChars.toDouble / totalChars else null
    new GenericInternalRow(Array[Any](w.toLong, uniq, gramFrac, charFrac))
  }
}

/** The overlapping word-n-gram sequence (TextOps.wordNgramsOf) as one
  * codegen'd pass — gram strings identical to the composed
  * `transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`
  * chain (the parity spec pins it), but built in a compiled loop
  * instead of four nested interpreted higher-order nodes.  Shingle
  * construction rides every dedup/sketch/decontamination path, and
  * the interpreted chain measured ~4.5 s of the sf10 minhash pass on
  * its own.
  */
case class WordNgramArray(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramArray.build(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${WordNgramArray.getClass.getName.stripSuffix("$")}.build($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramArray = copy(child = newChild)
}

object WordNgramArray {
  def build(toks: ArrayData, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GramRepetition.buildGrams(toks, n).asInstanceOf[Array[Any]])
}
