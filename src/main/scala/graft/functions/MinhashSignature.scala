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
