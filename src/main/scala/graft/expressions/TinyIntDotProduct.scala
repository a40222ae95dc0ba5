package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd integer dot product over two `array<tinyint>` SQ8 code
  * columns (SURVEY.md §4.2 discipline: custom Catalyst `Expression`
  * reserved for profiled-hot scalar paths; this is the near-dup pair
  * SCREEN kernel — the 1-byte/dim prefilter that lets the quadratic
  * in-cell pair stage carry 64-byte codes instead of 256-byte float
  * vectors and skip the double-precision cosine on provably-losing
  * pairs).
  *
  * Semantics: Σ aᵢ·bᵢ over the common prefix, products and the running
  * sum in Long — EXACT for any tinyint inputs (|Σ| ≤ dim·127² < 2⁶³ for
  * any realistic dim), so the result is engine-portable with no
  * float-order dependence. Identical to the declarative
  * `aggregate(zip_with(CAST(a AS ARRAY<BIGINT>), CAST(b AS ARRAY<BIGINT>),
  * (x,y) -> x*y), 0L, (s,v) -> s+v)` fold; the difference is one fused
  * loop over unsafe bytes inside whole-stage codegen versus an
  * interpreted lambda with intermediate array allocation.
  *
  * Assumes element arrays contain no nulls (code columns are built by
  * `transform` over non-null embeddings); extra elements beyond the
  * shorter length are ignored — callers pair fixed-dimension codes. */
case class TinyIntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tinyint_dot expects (array<tinyint>, array<tinyint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "tinyint_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $x.getByte($i) * (long) $y.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
