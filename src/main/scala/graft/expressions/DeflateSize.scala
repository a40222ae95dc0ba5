package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd DEFLATE-compressed size of a text/binary payload — the
  * compression-ratio quality signal (CCNet/RefinedWeb-family heuristic):
  * highly repetitive text compresses far below its raw size, and the
  * deflate ratio catches byte-level redundancy (repeated boilerplate,
  * padded markup, degenerate generations) that token-level TTR/entropy
  * miss. Level 6 (zlib default), one Deflater per evaluation, `finished`
  * drained fully — deterministic for a given payload on a given JDK
  * (the zlib algorithm is stable; the spec pins brute-force equality,
  * not magic constants, so a libzlib swap cannot break the suite).
  *
  * No DuckDB analogue exists, so the q114 gate is rows-only; semantics
  * are spec-gated against a driver-side Deflater brute force.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects string or binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    DeflateSize.compute(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[DeflateSize].getName
    val conv = if (child.dataType == StringType) ".getBytes()" else ""
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $cls.compute($x$conv);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  /** Deflate `bytes` at level 6 and return the compressed LENGTH only —
    * the output buffer is scratch, never materialized per row beyond
    * 8 KiB. Static so generated code can call it. */
  def compute(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
