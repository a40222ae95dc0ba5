package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Expression, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a first-class operator (SURVEY.md §4.2's reserved
  * custom-operator path, exercised): logical node + planner strategy +
  * physical heap execution, registered through `SparkSessionExtensions`
  * (see [[graft.GraftExtensions]]).
  *
  * Why not `row_number().over(window) <= k`: the window plan SORTS every
  * partition by (key, order) — O(n log n) over the full input, all n rows
  * shuffled — then discards all but k per key. The heap operator keeps a
  * bounded k-row buffer per key in one pass, O(n log k) with no sort, and
  * plans as partial → exchange → final (the aggregation shape): the
  * map-side partial trims each input partition to ≤ k rows per key, so
  * the exchange moves ≤ k·partitions rows per key instead of every scored
  * row — for ANN scoring (q36's shape: corpus × probes scored pairs,
  * k = 10 survivors per probe) that is the difference between shuffling
  * the scored corpus and shuffling a constant.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical heap top-k. `rankAttr = None` is the partial phase: any input
  * distribution, emits the surviving rows unranked. `rankAttr = Some(r)`
  * is the final phase: requires co-location by key, emits rank 1..k in
  * `order`. Both keep one bounded binary heap per key, worst element on
  * top, so each arriving row costs O(log k) against the current worst. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyExprs = keys
    val orderExprs = order
    val kLocal = k
    val isFinal = rankAttr.isDefined
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ascending "comes first" == better; heaps are max-heaps (worst on
      // top) via the reversed comparator
      val betterFirst = new LazilyGeneratedOrdering(orderExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, betterFirst.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.copy())
        } else if (betterFirst.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyIter = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit = {
          while (!current.hasNext && keyIter.hasNext) {
            val heap = keyIter.next()
            val rows = new Array[UnsafeRow](heap.size())
            var i = rows.length - 1
            // drain the max-heap worst-first into best-first order
            while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
            current =
              if (isFinal) {
                val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
                val joined = new JoinedRow
                rows.iterator.zipWithIndex.map { case (r, idx) =>
                  rankRow.update(0, (idx + 1).toLong)
                  outProj(joined(r, rankRow))
                }
              } else rows.iterator.map(r => r: InternalRow)
          }
        }
        override def hasNext: Boolean = { advance(); current.hasNext }
        override def next(): InternalRow = { advance(); numOutputRows += 1; current.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Column pruning across [[TopKPerKeyNode]] — the stock ColumnPruning
  * rule does not descend into custom nodes, so without this every TopK
  * input row carries ALL of the child's columns into the heap operator's
  * per-row UnsafeRow materialization (the operator is not codegen'd, so
  * its input is a real row-by-row boundary). For the ANN family that
  * meant BOTH 256-byte float vectors rode along with every scored pair
  * just to be dropped by the caller's select after ranking — at the 100×
  * fixture that is ~0.5 TB of dead row traffic per query. When a parent
  * Project uses a strict subset of the node's output, push a Project
  * below the node keeping only (parent references ∪ key refs ∪ order
  * refs); results are identical, only row width changes. Registered via
  * [[graft.GraftExtensions]] into the operator-optimization batch so it
  * composes to fixed point with the built-in pruning rules. */
object TopKPerKeyColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, t @ TopKPerKeyNode(keys, order, _, rank, child)) =>
      val needed = AttributeSet(
        p.references.filterNot(_.exprId == rank.exprId).toSeq ++
          keys.flatMap(_.references) ++ order.flatMap(_.references))
      val keep = child.output.filter(needed.contains)
      if (keep.size < child.output.size)
        p.copy(child = t.copy(child = Project(keep, child)))
      else p
  }
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange via distribution
  * requirement) → final, the two-phase aggregation shape. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rank, child) =>
      TopKPerKeyExec(keys, order, k, Some(rank),
        TopKPerKeyExec(keys, order, k, None, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing entry point. */
object TopK {
  /** Append `rankName` (1-based, per `orderCols` within each key group)
    * and keep only the top `k` rows per key. Equivalent to
    * `row_number().over(Window.partitionBy(keyCols).orderBy(orderCols)) <= k`
    * but executed by the heap operator — no per-partition sort, partial
    * trim before the shuffle. `orderCols` must be deterministic and total
    * (include a tie-breaker) for a well-defined rank. */
  def perKey(
      df: DataFrame,
      keyCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankName: String = "rank"): DataFrame = {
    import org.apache.spark.sql.graftglue.PlanGlue
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    // fail fast when the strategy is not injected: without it the node
    // only surfaces later as an opaque "No plan for TopKPerKeyNode"
    // planner assertion deep inside execution
    if (!PlanGlue.plannerStrategies(df.sparkSession).exists(_ eq TopKPerKeyStrategy))
      throw new IllegalStateException(
        "TopK.perKey requires the TopKPerKey planner strategy; create the session " +
          "with spark.sql.extensions=graft.GraftExtensions (GraftSession does), or " +
          "use a row_number window instead")
    // Spark 4 Columns carry unresolved ColumnNodes; resolve them by
    // analyzing throwaway select/sortWithinPartitions plans over the SAME
    // analyzed child, so the expressions come back bound to the child's
    // attribute ids and the custom node enters ofRows fully resolved.
    val analyzedChild = df.queryExecution.analyzed
    val childDf = PlanGlue.ofRows(df.sparkSession, analyzedChild)
    val keyExprs = childDf.select(keyCols: _*).queryExecution.analyzed
      .collectFirst { case p: Project => p.projectList }.get
      .map {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    val sortOrders = childDf.sortWithinPartitions(orderCols: _*).queryExecution.analyzed
      .collectFirst { case s: Sort => s.order }.get
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    PlanGlue.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrders, k, rank, analyzedChild))
  }
}
