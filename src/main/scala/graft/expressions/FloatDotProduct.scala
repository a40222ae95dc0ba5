package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float>` columns, in double
  * precision (SURVEY.md §4.2 / §7.5: custom Catalyst `Expression` reserved
  * for profiled-hot scalar paths; this is the ANN/near-dup scoring kernel).
  *
  * Semantics are IDENTICAL to the declarative form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, (s,v) -> s+v)`
  * — a left-to-right double-precision fold — so results are bit-equal to
  * both the higher-order-function fallback and the DuckDB oracle's
  * elementwise sum. The difference is purely mechanical: one fused loop
  * over the unsafe array data inside whole-stage codegen versus an
  * interpreted lambda evaluation per element with intermediate array
  * allocation (~20× on 64-dim vectors).
  *
  * Assumes element arrays contain no nulls (embedding columns are
  * `containsNull = false`); extra elements beyond the shorter length are
  * ignored, matching zip_with's null-pad-then-multiply-to-null behavior
  * only when lengths are equal — callers pair fixed-dimension vectors.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
