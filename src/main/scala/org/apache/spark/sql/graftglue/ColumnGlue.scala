package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 routes Column construction through ColumnNodes and keeps the
  * conversion (`classic.ExpressionUtils`) private[sql]; this one-file
  * subpackage exposes exactly the two conversions the engine needs —
  * the established pattern for third-party Catalyst expression libraries.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
