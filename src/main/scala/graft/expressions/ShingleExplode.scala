package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-exposed table function (SURVEY.md §2.11 UDTF, the Catalyst
  * `Generator` path): one output row per DISTINCT n-gram word shingle of
  * the input text, in first-occurrence order — usable from pure SQL as
  *
  *   SELECT d.doc_id, s.shingle
  *   FROM docs d LATERAL VIEW explode_shingles(text, 3) s AS shingle
  *
  * (or in SELECT position like `explode`). Docs with fewer than n tokens
  * emit no rows — the shingle-set drop rule shared with the whole dedup
  * family; the row source is the same fused tokenizer the signature
  * kernels use, so SQL users and the typed operators see identical
  * shingle sets (tokenization contract unit-tested). Evaluation is
  * per-row interpreted (CodegenFallback): generators run inside
  * GenerateExec, which drives non-codegen generators efficiently; the
  * hot dedup paths never route through this — it exists for the SQL
  * surface. */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"explode_shingles expects string, got ${child.dataType.simpleString}")

  override def prettyName: String = "explode_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else TextSignatureKernels.shingleStrings(v.asInstanceOf[UTF8String], n)
      .iterator.map(s => InternalRow(s))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
