package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog as a custom Catalyst AGGREGATE
  * (`TypedImperativeAggregate`) — the aggregate-function tier of the
  * extension preference order, completing the tour next to the
  * codegen'd scalar expressions, the optimizer rules, the planner
  * strategy, and the DSv2 source.
  *
  * `graft_hll(key)` drops into ANY `groupBy.agg(...)` as one
  * expression: the m-register buffer updates per row (one XXH64 + a
  * max), merges register-wise in the partial-aggregation machinery,
  * and evals to `(buckets_used, est_distinct)` — no explode, no
  * intermediate register TABLE, which is exactly what the DataFrame
  * formulation (`SketchOps.hllRegisters`) materializes.  The two are
  * complementary: the aggregate form wins when the estimate is all
  * you need (state never leaves the agg buffer); the table form wins
  * when registers must PERSIST and merge across ingestion days.
  *
  * Bit-compatibility contract (spec-pinned, and q_hll_agg shares
  * q_hll_distinct's DuckDB oracle verbatim): same hash
  * (`XxHash64Function`, seed 42 — identical to the `xxhash64`
  * expression), same bucket/rho layout (top-p bits / leading-zero
  * rank), same estimator chain as `SketchOps.hllEstimate` — harmonic
  * sum exact in BigInteger where the SQL form uses decimal(38,0),
  * every double op in the same order.
  *
  * Unlike `approx_count_distinct`'s opaque HLL++ state, the buffer
  * layout here is the documented register array — serialize is a
  * plain int sequence.
  */
case class HllSketchAgg(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"graft_hll: precision p=$p outside [4,16]")
  private val m = 1 << p
  private val wbits = 64 - p
  private val mask = (1L << wbits) - 1L

  override def dataType: DataType = StructType(Seq(
    StructField("buckets_used", LongType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key (cast first), " +
        s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, StringType, 42L)
      val bucket = (h >>> wbits).toInt
      val w = h & mask
      val rho =
        if (w == 0L) wbits + 1
        else wbits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var used = 0
    var sPresent = java.math.BigInteger.ZERO
    var i = 0
    while (i < m) {
      val rho = buf(i)
      if (rho > 0) {
        used += 1
        sPresent = sPresent.add(
          java.math.BigInteger.ONE.shiftLeft(wbits + 1 - rho))
      }
      i += 1
    }
    val zeros = m - used
    val sTotal = sPresent.add(java.math.BigInteger.valueOf(zeros.toLong)
      .multiply(java.math.BigInteger.ONE.shiftLeft(wbits + 1)))
    // the EXACT double chain of SketchOps.hllEstimate, same op order
    val sTotalD = new java.math.BigDecimal(sTotal).doubleValue()
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val estRaw = alpha * m.toDouble * m.toDouble *
      (java.lang.Math.scalb(1.0, wbits + 1) / sTotalD)
    val est =
      if (estRaw <= 2.5 * m && zeros > 0)
        m.toDouble * math.log(m.toDouble / zeros.toDouble)
      else estRaw
    InternalRow(used.toLong, est)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllSketchAgg = copy(child = newChild)
}
