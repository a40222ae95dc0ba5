package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Codegen'd 16-bin high-nibble byte histogram over a binary payload — the
  * q41 featurization hot path as ONE fused byte loop.
  *
  * Replaces the round-3 declarative form
  * `transform(sequence(0,15), k -> size(filter(nibs, v -> v = k)))`, whose
  * single-referenced nibble array CollapseProject inlined INTO the 16-bin
  * lambda: 16 corpus-wide array re-evaluations per row (the slowest query
  * in BENCH_r03 at 14.5 s on a contended box). This kernel reads each
  * payload byte exactly once and allocates one 16-long array per row.
  *
  * Bin semantics match [[graft.operators.Multimodal.decodeStub]] exactly:
  * bin = (byte & 0xFF) >> 4 on the RAW bytes — so the relational and typed
  * paths agree on any payload, not just ASCII (the round-3 `ascii(char)`
  * form only matched on single-byte code points).
  */
case class NibbleHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nibble_hist expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "nibble_hist"

  override protected def nullSafeEval(input: Any): Any =
    NibbleHistogram.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[NibbleHistogram].getName
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $cls.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NibbleHistogram {
  /** One pass: counts[(b & 0xFF) >> 4]++ per byte. */
  def compute(bts: Array[Byte]): ArrayData = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bts.length) {
      counts((bts(i) & 0xff) >> 4) += 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}
