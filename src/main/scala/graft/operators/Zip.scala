package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Cluster-scale positional (index-paired) combination — the batch half
  * of the claimed `zip` vocabulary (the streaming lockstep facade is
  * [[graft.streaming.StreamCombine.zip]]).
  *
  * A distributed engine has no arrival order, so the pairing index is
  * DERIVED from an explicit sort order. The scalable shape is the global
  * sort Spark already does well — ONE range exchange + per-partition
  * local sort — followed by `zipWithIndex`'s two-pass contiguous
  * numbering (per-partition counts collected once, ~numPartitions longs
  * of driver traffic, then offset + local position per row). Never a
  * single-partition `row_number() OVER ()` window, which serializes the
  * corpus through one task.
  */
object Zip {

  /** Append `seqCol`: this row's 0-based rank under `orderCols`.
    * `orderCols` must be a TOTAL order (e.g. include a unique key) —
    * with ties, the rank among tied rows would depend on partitioning.
    * One range exchange + one tiny count job ([[org.apache.spark.rdd.RDD.zipWithIndex]]);
    * the RDD hop is the documented per-partition-imperative exception
    * (SURVEY §7.1): Catalyst has no contiguous-global-index operator
    * that avoids the one-task window. */
  def seqByOrder(
      df: DataFrame,
      orderCols: Seq[Column],
      seqCol: String = "seq"): DataFrame =
    seqByOrderCounted(df, orderCols, seqCol)._1

  /** [[seqByOrder]] plus the TOTAL row count, driver-side for free: the
    * two-pass contiguous numbering already collects per-partition counts
    * (zipWithIndex's internals, reproduced here so the offsets are OURS
    * to sum) — exposing their sum costs zero extra jobs. The consumer is
    * [[SuffixArray.suffixRanks]]' doubling loop, where the class count
    * per round previously needed a whole-frame max(rank) scan of the
    * round's checkpoint; the numbering pass knows it already (r18
    * verdict item 5 round-fusion study). */
  private[graft] def seqByOrderCounted(
      df: DataFrame,
      orderCols: Seq[Column],
      seqCol: String = "seq"): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "seqByOrder needs at least one order column")
    require(!df.columns.contains(seqCol), s"column '$seqCol' already exists")
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(seqCol, LongType, nullable = false)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex { case (pi, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1L }; Iterator(pi -> c)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = if (offsets.isEmpty) 0L else offsets.last
    val withSeq = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var i = offsets(pi)
      it.map { row => val out = Row.fromSeq(row.toSeq :+ i); i += 1L; out }
    }
    (sorted.sparkSession.createDataFrame(withSeq, schema), total)
  }

  // NOTE (r14, measured): a "pinned" variant persisting the sorted
  // parent (to dodge zipWithIndex's two-pass recompute) was built and
  // benchmarked in the suffix-array doubling loop — it cost MORE wall
  // time and 2.2× the CPU (persist serialization) than the recompute it
  // saved, at both MEMORY_AND_DISK and in-loop joined-frame persists.
  // The two-pass recompute stays the deliberate shape.

  /** Pair the i-th row of `a` under `aOrder` with the i-th row of `b`
    * under `bOrder` (ReactiveX `zip` for tables): inner join on the
    * derived index, so the result trims to the shorter side. Column
    * names must be disjoint (rename upstream). Both sides are
    * presumed comparably sized (that is what zipping means), so the
    * index join is forced shuffle-hash — an estimate-driven broadcast
    * of either side would ship a corpus. */
  def zipByOrder(
      a: DataFrame,
      aOrder: Seq[Column],
      b: DataFrame,
      bOrder: Seq[Column],
      seqCol: String = "seq"): DataFrame = {
    val overlap = a.columns.toSet intersect b.columns.toSet
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    seqByOrder(a, aOrder, seqCol).hint("shuffle_hash")
      .join(seqByOrder(b, bOrder, seqCol).hint("shuffle_hash"), seqCol)
  }
}
