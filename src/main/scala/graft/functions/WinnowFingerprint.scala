package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer et al., SIGMOD'03) as
  * ONE compiled pass — exactly TextOps' composed form (parity spec +
  * the q_doc_winnow_md5 oracle pin it): hash every character k-gram,
  * keep the minimum of each sliding window of w gram hashes, distinct
  * in first-occurrence order.
  *
  * The composed chain is O(chars·w) interpreted work — 250M substring
  * allocations for the gram pass, then a w-slot `slice` array copy
  * per window for the minima (measured 63 s at sf10 for k=8, w=16).
  * Here: one pass builds the char→byte offset table (so each gram
  * hash reads the UTF-8 bytes in place — `substr` is CHARACTER-based,
  * and per-gram `substringSQL` would be O(n²)), the window minima run
  * in O(grams) via a monotonic deque, and `array_min`'s ordering is
  * plain long comparison.
  *
  * Hash parity: `portable = false` is Spark's seed-42 XXH64 of the
  * gram's UTF-8 bytes (the built-in `xxhash64`); `portable = true` is
  * the md5-60bit convention (first 15 hex chars — the same nibble
  * arithmetic as BloomContamination) so DuckDB replays it.
  */
case class WinnowFingerprint(
    child: Expression, k: Int, w: Int, portable: Boolean)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k=$k, w=$w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // char index -> starting byte offset (UTF-8 lead bytes), plus the
    // terminal offset so gram i spans [starts(i), starts(i+k))
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = nBytes

    val md = if (portable) BloomContamination.md5() else null
    val nGrams = math.max(nChars - (k - 1), 1)
    val hashes = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = starts(math.min(i + k, nChars))
      hashes(i) =
        if (portable) {
          md.reset()
          md.update(bytes, from, until - from)
          val d = md.digest()
          var h = 0L
          var b = 0
          while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
          (h << 4) | ((d(7) & 0xffL) >>> 4) // first 15 hex chars
        } else {
          // the exact built-in xxhash64: seed-42 XXH64 over the gram's
          // UTF-8 bytes (fromBytes wraps the range without copying)
          XXH64.hashUTF8String(
            UTF8String.fromBytes(bytes, from, until - from), 42L)
        }
      i += 1
    }

    // sliding-window minima via monotonic deque (indices, increasing
    // hash values); array_min ties keep ANY equal value — identical
    // longs, so <= keeps the LATEST index like a fresh array_min scan
    // over each slice would (values equal either way)
    val nWin = math.max(nGrams - (w - 1), 1)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(nWin, 64))
    i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i
      tail += 1
      val winStart = i - (w - 1)
      while (deque(head) < winStart) head += 1
      // window j = [j, j+w) completes at i = j+w-1; the clamped short
      // input (nGrams < w) completes its single window at the end
      if (i >= w - 1 || i == nGrams - 1) {
        val m = hashes(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprint = copy(child = newChild)
}
