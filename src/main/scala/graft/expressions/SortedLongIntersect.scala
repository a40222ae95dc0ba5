package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd intersection COUNT over two ASCENDING-sorted
  * `array<bigint>` columns — the set-similarity verify kernel
  * (SURVEY.md §4.2: custom Catalyst `Expression` reserved for
  * profiled-hot scalar paths; this one displaced `array_intersect` in
  * [[graft.operators.Dedup.prefixFilterPairs]]'s per-candidate verify,
  * where hashing boxed Longs per pair measured ~3 s of a 4 s pipeline
  * at sf0.1).
  *
  * Semantics: |A ∩ B| as a linear sorted-merge over the unsafe array
  * words — no per-element allocation, no hash set. Both inputs MUST be
  * ascending and duplicate-free (the contract of a sorted distinct-hash
  * set; [[graft.operators.Dedup]] builds them with `array_sort` over
  * kernel-distinct shingle hashes). On unsorted input the count is
  * undefined — callers own the invariant, matching the preconditions
  * documented on Spark's own `SortMergeJoin`.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull arrays are rejected, not just undocumented:
    // ArrayData.getLong reads a null slot as 0, a phantom match
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect expects (array<bigint not null>, array<bigint not null>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_long_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.SortedLongIntersect.count($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  /** Linear merge over two ascending long arrays; O(|a|+|b|), allocation-free. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
