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

  /** Every release below makes Spark WARN that the truncated lineage
    * "cannot be recomputed" — correct and by design (the successor frame
    * is already materialized), but it would print once per CC round for
    * the driver's whole lifetime. Deny exactly that MESSAGE with a
    * filter, not a logger-level change: nearly every Dataset-derived RDD
    * is a MapPartitionsRDD, so muting that logger would also swallow
    * unrelated real warnings (persist-level conflicts, "local
    * checkpointing is NOT fault tolerant" under dynamic allocation).
    * Installed lazily on the FIRST release — SparkContext startup
    * reconfigures log4j (the default-profile load), wiping anything
    * added before the session exists. Best effort: if the log4j core
    * API is absent or changes, the warning prints, which is harmless. */
  private lazy val checkpointWarnFilter: Unit =
    try {
      import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.AbstractFilter
      val deny = new AbstractFilter(Filter.Result.DENY, Filter.Result.NEUTRAL) {
        override def filter(event: LogEvent): Filter.Result =
          if (event.getMessage.getFormattedMessage.contains(
            "lineage has been truncated and cannot be recomputed")) onMatch
          else onMismatch
      }
      deny.start()
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val existing = conf.getLoggerConfig(name)
      val target =
        if (existing.getName == name) existing
        else {
          // inherit the effective level observed at setup (a null level
          // here breaks the config); additive so root appenders still run
          val lc = new LoggerConfig(name, existing.getLevel, true)
          conf.addLogger(name, lc)
          lc
        }
      target.addFilter(deny)
      ctx.updateLoggers()
    } catch { case _: Throwable => () }

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
        checkpointWarnFilter
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
