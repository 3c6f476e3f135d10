package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row bloom decontamination counts in ONE compiled pass —
  * exactly TextOps.bloomContaminationCols' composed form (the parity
  * spec and the q_bloom_decontaminate oracle pin it): build the
  * distinct word n-grams, and for each test whether all k
  * Kirsch–Mitzenmacher positions `(h1 + j·h2) mod m` are set in the
  * packed filter, with h1/h2 the two 60-bit md5 slices the portable
  * hash convention uses (hex chars 1-15 and 17-31 — computed here by
  * nibble arithmetic on the digest bytes, no hex string).
  *
  *   struct(n_grams, n_flagged)
  *
  * Why an expression: the composed form is an interpreted `aggregate`
  * fold allocating a struct per gram, and its lambda computes the md5
  * TWICE per gram (once per 60-bit slice — separate expression trees,
  * no CSE inside an interpreted lambda) plus two 36-char hex-string
  * builds and a base-16 `conv` parse.  One digest per gram, k bit
  * probes, zero per-gram allocation beyond the digest.
  */
case class BloomContamination(
    child: Expression, words: Array[Long], n: Int, mBits: Int, k: Int)
    extends UnaryExpression {

  require(mBits % 64 == 0 && words.length == mBits / 64,
    s"packed filter must be mBits/64 longs (got ${words.length} for $mBits)")
  require(k <= 7, s"k=$k would overflow the position arithmetic")

  override def dataType: DataType = BloomContamination.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_contamination"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  def compute(toks: ArrayData): InternalRow = {
    val grams = GramRepetition.buildGrams(toks, n)
    val seen = new java.util.HashSet[UTF8String](grams.length * 2)
    val md = BloomContamination.digest.get()
    var nGrams = 0L
    var nFlagged = 0L
    var i = 0
    while (i < grams.length) {
      if (seen.add(grams(i))) {
        nGrams += 1
        md.reset()
        val d = md.digest(grams(i).getBytes)
        // h1 = hex chars 1-15 (60 bits): bytes 0-6 + high nibble of 7;
        // h2 = hex chars 17-31: bytes 8-14 + high nibble of 15
        var h1 = 0L
        var h2 = 0L
        var b = 0
        while (b < 7) {
          h1 = (h1 << 8) | (d(b) & 0xffL)
          h2 = (h2 << 8) | (d(b + 8) & 0xffL)
          b += 1
        }
        h1 = (h1 << 4) | ((d(7) & 0xffL) >>> 4)
        h2 = (h2 << 4) | ((d(15) & 0xffL) >>> 4)
        var hit = true
        var j = 0
        while (hit && j < k) {
          val pos = ((h1 + j.toLong * h2) % mBits).toInt
          hit = (words(pos >>> 6) & (1L << (pos & 63))) != 0
          j += 1
        }
        if (hit) nFlagged += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nGrams, nFlagged))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomCtm", this, classOf[BloomContamination].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContamination = copy(child = newChild)
}

object BloomContamination {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_flagged", LongType, nullable = false)))

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared per-thread digest for the md5-based fused expressions. */
  private[functions] def md5(): java.security.MessageDigest = digest.get()
}
