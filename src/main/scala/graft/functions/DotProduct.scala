package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two float/double arrays with double accumulation — a
  * native codegen'd replacement for the engine's original
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form: Spark's
  * higher-order array functions are evaluated INTERPRETED (lambda
  * dispatch per element), which dominates the LSH/IVF/cosine hot
  * paths where every candidate pair pays dim multiply-adds.
  *
  * Semantics match the higher-order form exactly, including the IEEE
  * operation order (cast each element to double, multiply, then
  * left-fold add from 0.0) so every DuckDB-oracled cosine stays
  * bit-identical — and the null behavior: NULL if either array is
  * NULL, if lengths differ (zip_with pads with null), or if any
  * element is null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    def get(v: String, e: Expression, i: String): String =
      if (elemIsFloat(e)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val bad = ctx.freshName("bad")
    val arrayCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        $arrayCls $a = ${leftGen.value};
        $arrayCls $b = ${rightGen.value};
        int $n = $a.numElements();
        if ($n == $b.numElements()) {
          boolean $bad = false;
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $s += (${get(a, left, i)}) * (${get(b, right, i)});
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $s; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
