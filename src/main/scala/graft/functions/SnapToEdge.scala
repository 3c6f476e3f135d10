package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Snap a double to the LOWER edge of its bucket in a sorted edge
  * array — the per-row kernel of the `maxDistinct` prebin scale valve
  * (WoeBinning.snapToEdges) and the streaming state cap.
  *
  * Semantics match `ml.feature.Bucketizer` over splits
  * `(-inf, edges(1), …, edges(n-2), +inf)` exactly: bucket i covers
  * `[splits(i), splits(i+1))`, the top bucket is closed above, and the
  * snapped value is the bucket's representative `edges(i)` (so every
  * value below `edges(1)` maps to `edges(0)` and everything at or
  * above `edges(n-2)` maps to it).  NaN and null pass through
  * unchanged — missing values carry their own semantics through the
  * fit and must not land in a numeric bucket.
  *
  * Why an Expression and not the Bucketizer: Bucketizer.transform
  * wraps a Scala UDF, which boxes every row and fences whole-stage
  * codegen right where the scale valve sits in the hot path.  Spark
  * has no composable binary-search-over-literal-array function (a
  * `when`-chain is O(edges) per row), so this is the
  * custom-`Expression` tier: one static `Arrays.binarySearch` call
  * per row from generated code, O(log edges), codegen-friendly.
  */
case class SnapToEdge(child: Expression, edges: Array[Double])
    extends UnaryExpression {

  require(edges.length >= 2 && edges.sliding(2).forall(p => p(0) < p(1)),
    s"graft_snap_to_edge: need >= 2 strictly increasing edges, got ${edges.length}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_snap_to_edge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SnapToEdge.snap(input.asInstanceOf[Double], edges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the sorted edge array once per task as a referenced object,
    // not once per row as a literal array constructor
    val arr = ctx.addReferenceObj("snapEdges", edges, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"${SnapToEdge.getClass.getName.stripSuffix("$")}.snap($c, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): SnapToEdge =
    copy(child = newChild)
}

object SnapToEdge {
  /** Static helper the generated code calls.  Interior edges
    * `edges(1..n-2)` are the split points (the outermost Bucketizer
    * splits are ±inf); `Arrays.binarySearch` over the full array with
    * index clamping gives the same bucket assignment in O(log n).
    */
  def snap(v: Double, edges: Array[Double]): Double = {
    if (java.lang.Double.isNaN(v)) return v
    val idx = java.util.Arrays.binarySearch(edges, v)
    val bucket =
      if (idx >= 0) math.min(idx, edges.length - 2) // exact edge hit; top edge closed
      else {
        val ins = -idx - 1 // first edge > v
        // v below edges(1) → bucket 0 (split is -inf); v at/above
        // edges(n-2) → top bucket n-2 (split is +inf)
        math.min(math.max(ins - 1, 0), edges.length - 2)
      }
    edges(bucket)
  }

  /** Column builder. */
  def apply(c: Column, edges: Array[Double]): Column =
    ColumnBridge.column(SnapToEdge(ColumnBridge.expression(c), edges))
}
