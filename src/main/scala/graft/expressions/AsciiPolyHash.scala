package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash h = fold(h*31 + byte) mod 1e9+7 — the
  * portable MinHash shingle hash (Dedup.portableMinHashPairs / q47) as a
  * fused byte loop instead of a per-character interpreted lambda chain
  * (`aggregate(transform(split(s,''), ascii), ...)`).
  *
  * Byte-identical to the declarative char fold for ASCII input (the
  * corpus contract; multi-byte code points would diverge — the oracle-
  * facing semantics are defined over ASCII text). */
case class AsciiPolyHash(child: Expression) extends UnaryExpression {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_poly_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "ascii_poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bts = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bts.length) {
      h = (h * 31 + (bts(i) & 0xff)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bts = ctx.freshName("bts")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bts = $x.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  $h = ($h * 31 + ($bts[$i] & 0xFF)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
