package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash (Charikar 2002 / Manku et al. WWW'07) of a text column as
  * ONE codegen'd byte scan — bit-identical to DedupOps' explode
  * formulation (`simhashByExplode`, kept as the parity reference):
  * xxhash64 (seed-42 XXH64, the built-in) of every whitespace token,
  * per-bit ±1 votes, bit set where votes > 0.
  *
  * Why an expression: simhash is PER-ROW — the explode + 64-column
  * aggregation exists only because per-element lambdas run
  * interpreted.  That formulation pays an explode of every token and
  * a shuffle of 64 aggregation buffers per document; this one is a
  * single projection — tokenize in place (the TokensArray scan), hash
  * each token's bytes without copying, accumulate 64 counters in
  * registers.  No shuffle at all.
  *
  * Null contract: null text → null, and a TOKEN-LESS text (empty or
  * all-whitespace) → null too — the explode form emits no row for
  * such a document, so callers filter `isNotNull` to reproduce its
  * output exactly (a 0L would instead invent a signature that
  * hamming-matches every other empty document).
  *
  * `portable = true` is the md5-60bit convention (first 15 hex chars,
  * the [[BloomContamination]] / [[WinnowFingerprint]] arithmetic) so
  * the DuckDB oracle replays the pipeline; `nBits` bounds the voted
  * bit range (60 for the portable flavor).
  */
case class SimhashBits(child: Expression, nBits: Int, portable: Boolean)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64, s"nBits=$nBits out of [1, 64]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // token-less text → null
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashBits.compute(input.asInstanceOf[UTF8String], nBits, portable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimhashBits.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("simhash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $tmp = $cls.compute($c, $nBits, $portable);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimhashBits = copy(child = newChild)
}

object SimhashBits {
  def compute(text: UTF8String, nBits: Int, portable: Boolean): java.lang.Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](nBits)
    val md = if (portable) BloomContamination.md5() else null
    var sawToken = false
    var i = 0
    var start = -1
    while (i <= n) {
      val ws = i == n || {
        val b = bytes(i)
        b == 0x20 || (b >= 0x09 && b <= 0x0d)
      }
      if (ws) {
        if (start >= 0) {
          val h =
            if (portable) {
              md.reset()
              md.update(bytes, start, i - start)
              val d = md.digest()
              var acc = 0L
              var k = 0
              while (k < 7) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
              (acc << 4) | ((d(7) & 0xffL) >>> 4) // first 15 hex chars
            } else {
              XXH64.hashUTF8String(
                UTF8String.fromBytes(bytes, start, i - start), 42L)
            }
          sawToken = true
          var b = 0
          while (b < nBits) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (!sawToken) null
    else {
      var r = 0L
      var b = 0
      while (b < nBits) {
        if (votes(b) > 0) r |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(r)
    }
  }
}
