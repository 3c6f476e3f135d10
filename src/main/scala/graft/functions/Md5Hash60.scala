package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 60-bit hash — `conv(substring(md5(c), 1,
  * 15), 16, 10)` (the first 15 hex chars of the md5, the convention
  * every DuckDB oracle replays) — as ONE codegen'd call.
  *
  * The composed form materializes the 32-char hex string, copies a
  * 15-char substring, and PARSES it back base-16: three string
  * allocations per hashed gram, on the explode-side hot path of every
  * portable-flavor pipeline (minhash base hashes, source-overlap
  * grams, bloom keys, DSIR buckets).  Here the digest bytes become
  * the long directly — the same nibble arithmetic
  * [[WinnowFingerprint]] and [[SimhashBits]] already pin: 7 bytes
  * shifted in, plus the high nibble of byte 7.
  *
  * Accepts STRING (hashes the UTF-8 bytes — exactly what
  * `md5(cast(c as binary))` sees) and BINARY.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary input, got ${other.catalogString}")
  }

  // def, not val: the child is unresolved at construction time
  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) Md5Hash60.hashString(input.asInstanceOf[UTF8String])
    else Md5Hash60.hashBytes(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Hash60.getClass.getName.stripSuffix("$")
    val fn = if (isString) "hashString" else "hashBytes"
    defineCodeGen(ctx, ev, c => s"$cls.$fn($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash60 = copy(child = newChild)
}

object Md5Hash60 {
  def hashString(s: UTF8String): Long = hashBytes(s.getBytes)

  def hashBytes(bytes: Array[Byte]): Long = {
    val md = BloomContamination.md5()
    md.reset()
    md.update(bytes)
    val d = md.digest()
    var acc = 0L
    var k = 0
    while (k < 7) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
    (acc << 4) | ((d(7) & 0xffL) >>> 4) // first 15 hex chars
  }
}
