package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass content-defined chunking kernel — the codegen'd fast path
  * behind [[graft.operators.Cdc.chunks]]. The declarative HOF form is
  * O(W·n) per document with a fresh W-element sequence allocated per
  * position (it was the registry's worst sf0.1 query at 8 s); this
  * kernel keeps the identical cut/hash mathematics in ONE rolling pass:
  * the window hash updates by subtracting the outgoing code point's
  * 31^(W−1) term (mod P), and chunk hashes accumulate alongside —
  * O(n), no per-position allocation. Bit-equality with the declarative
  * form is spec-gated (CdcSpec) and the q169 oracle replays the same
  * arithmetic in SQL.
  *
  * Character semantics: CODE POINTS, each contributing its code-point
  * VALUE — the DuckDB `ascii()` convention the oracle uses (identical
  * to Spark's `ascii` on BMP text; the fixture and any real corpus
  * agree on both). */
object CdcChunks {

  final val Window = 16
  final val P = 1000000007L
  final val Base = 31L
  /** 31^(Window−1) mod P — the outgoing code point's weight. */
  final val OutWeight: Long = {
    var r = 1L
    var i = 0
    while (i < Window - 1) { r = r * Base % P; i += 1 }
    r
  }

  /** (start, len, hash) chunk rows for one document — 1-based start in
    * code points; empty text yields an empty array (the operator's
    * no-content-no-chunks contract). */
  def chunks(text: UTF8String, divisor: Long): ArrayData = {
    val s = text.toString
    var cp = new Array[Int](math.max(8, s.length))
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val c = s.codePointAt(ci)
      cp(n) = c
      n += 1
      ci += Character.charCount(c)
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val rows = new scala.collection.mutable.ArrayBuffer[InternalRow](8)
    var win = 0L   // poly hash of the last min(i, Window) code points
    var ch = 0L    // poly hash of the current chunk so far
    var start = 1  // 1-based chunk start
    var i = 0      // 0-based index into cp
    while (i < n) {
      val c = cp(i) & 0x1fffffL
      win =
        if (i < Window) (win * Base + c) % P
        else Math.floorMod((win - (cp(i - Window) & 0x1fffffL) * OutWeight % P) * Base + c, P)
      ch = (ch * Base + c) % P
      val pos = i + 1
      if (pos >= Window && pos <= n - 1 && win % divisor == 0L) {
        rows += InternalRow(start.toLong, (pos - start + 1).toLong, ch)
        start = pos + 1
        ch = 0L
      }
      i += 1
    }
    rows += InternalRow(start.toLong, (n - start + 1).toLong, ch)
    new GenericArrayData(rows.toArray[Any])
  }
}

/** Codegen'd CDC chunk table for one document — array of
  * struct(s, len, h); see [[CdcChunks]]. */
case class CdcChunksKernel(child: Expression, divisor: Long) extends UnaryExpression {
  require(divisor >= 2, s"cdc_chunks: divisor $divisor must be >= 2")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.CdcChunks.chunks($x, ${divisor}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
