package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature from a base-hash array in ONE compiled loop —
  * exactly DedupOps' composed form (the parity spec pins it):
  *
  *   sig_i = min over h in base of (h·a_i + b_i) mod P,  P = 2³¹−1
  *
  * with `array_min`'s null semantics (null base elements skipped; an
  * empty base yields all-null signature slots).  The composed chain
  * is `numHashes` interpreted `transform` + `array_min` passes over
  * the base array — numHashes × |shingles| boxed lambda evaluations
  * per row; measured +2.2 s of the sf10 minhash pass for 32 hashes.
  * No overflow: h < P and a < P−1 keep h·a + b < 2⁶².
  */
case class MinhashSignature(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {

  require(a.length == b.length, "a/b parameter arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  def compute(base: ArrayData): ArrayData = {
    val m = base.numElements()
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      if (!base.isNullAt(j)) {
        any = true
        val h = base.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * a(i) + b(i)) % MinhashSignature.P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k)) // all nulls
    else new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  val P: Long = 2147483647L // 2^31-1, Mersenne prime (DedupOps.P)
}

/** MinHash signature straight from the GRAM STRINGS in one compiled
  * loop — base hash (seed-42 XXH64 or the portable md5-60, both mod
  * P) and the k affine minima fused, so the signature stage of
  * [[graft.ops.DedupOps.minhashPairs]] becomes a PROJECTION of the
  * persisted shingle table instead of an explode of every gram
  * occurrence plus a 33-column aggregation shuffle (bit-parity with
  * that formulation is spec-pinned; the explode form stays as the A/B
  * reference).
  *
  * Null contract: null gram array → null, EMPTY gram array → null too
  * — the explode form emits no row for such a document, so callers
  * filter `isNotNull` to reproduce its row set; null gram elements
  * are skipped (never produced by `shinglesOf`, but array_min would
  * skip them).
  */
case class MinhashFromGrams(
    child: Expression, a: Array[Long], b: Array[Long], portable: Boolean)
    extends UnaryExpression {

  require(a.length == b.length, "a/b parameter arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty gram array → null
  override def prettyName: String = "graft_minhash_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  def compute(grams: ArrayData): ArrayData = {
    val m = grams.numElements()
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      if (!grams.isNullAt(j)) {
        any = true
        val g = grams.getUTF8String(j)
        val h0 =
          if (portable) Md5Hash60.hashString(g)
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(g, 42L)
        val h = ((h0 % MinhashSignature.P) + MinhashSignature.P) %
          MinhashSignature.P
        var i = 0
        while (i < k) {
          val v = (h * a(i) + b(i)) % MinhashSignature.P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashGrams", this,
      classOf[MinhashFromGrams].getName)
    val tmp = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp = $self.compute($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashFromGrams = copy(child = newChild)
}
