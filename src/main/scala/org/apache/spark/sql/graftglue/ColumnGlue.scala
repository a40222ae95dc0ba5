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

/** DataFrame ⇄ LogicalPlan bridge for graft's custom operators: build a
  * DataFrame from a hand-constructed logical node (Dataset.ofRows is
  * private[sql]) and read a Dataset's analyzed plan back out. */
object PlanGlue {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** The session's active planner strategies (sessionState is private[sql]
    * — this subpackage is inside the boundary). Lets library entry points
    * fail fast with a clear message when a required injected strategy is
    * absent, instead of dying later on an opaque planner assertion. */
  def plannerStrategies(
      spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.strategies

  /** Release the storage blocks behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only reaches CacheManager entries (`.persist`/
    * `.cache`); a local checkpoint's blocks belong to the RDD inside the
    * plan's `LogicalRDD` leaf and otherwise live until the driver GCs the
    * RDD and the ContextCleaner reaps it — iterative algorithms that
    * checkpoint per round would accumulate every round's blocks for the
    * loop's lifetime. Callers release a SUPERSEDED frame only: after the
    * successor is eagerly materialized, nothing re-reads these blocks
    * (and the truncated lineage means a re-read could not recompute).
    *
    * Requires the frame to BE the checkpoint — its analyzed plan must be a
    * single `LogicalRDD` leaf (what `localCheckpoint` returns), not a plan
    * derived from one. A derived plan could share its leaf with a still-live
    * sibling dataset, and because checkpointing truncated lineage, dropping
    * the shared blocks would make the sibling's next read FAIL (checkpoint
    * block not found) rather than recompute — so misuse fails fast here. */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case other =>
        throw new IllegalArgumentException(
          "[PlanGlue.releaseLocalCheckpoint] expected a bare localCheckpoint " +
            "frame (a single LogicalRDD leaf); got a derived plan rooted at " +
            s"${other.nodeName}. Releasing a derived frame could unpersist a " +
            "LogicalRDD shared with a live dataset, whose truncated lineage " +
            "then cannot recompute — pass the checkpointed frame itself.")
    }
}
