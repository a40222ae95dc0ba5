package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Change-point suppression — ReactiveX `distinctUntilChanged` for tables
  * and streams (the reference claims the Flux vocabulary via
  * `sinks.asFlux()`, README.md:45,107). Unlike `distinct`, only
  * CONSECUTIVE repeats are dropped: a value may recur later and is kept
  * again. Also a real pipeline primitive — collapsing status/state event
  * streams to their transitions before sessionization or storage.
  *
  * A distributed table has no arrival order, so "consecutive" is defined
  * by an explicit per-key total order, exactly like [[Zip.seqByOrder]]
  * derives zip's pairing index from a sort order.
  */
object Changes {

  /** Keep the first row of every run of equal `valueCols` within each
    * `keyCols` group ordered by `orderCols`; drop the rest of the run.
    *
    * `orderCols` must totally order rows within a key (include a unique
    * tiebreaker) — with ties, which row of a run survives would depend
    * on partitioning. Comparison is null-safe (`<=>`): a run of NULLs is
    * one run, and NULL→value / value→NULL are both transitions.
    *
    * Scale shape: the canonical window plan — ONE hash exchange on the
    * key + per-partition sort; `lag(1)` is O(1) state per row, no
    * buffering of the run. Survives 100× because nothing here depends on
    * group cardinality (no collect_list, no self-join). */
  def distinctUntilChanged(
      df: DataFrame,
      keyCols: Seq[Column],
      orderCols: Seq[Column],
      valueCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "distinctUntilChanged needs at least one key column")
    require(orderCols.nonEmpty, "distinctUntilChanged needs at least one order column")
    require(valueCols.nonEmpty, "distinctUntilChanged needs at least one value column")
    val prevCol = "_duc_prev"
    require(!df.columns.contains(prevCol), s"column '$prevCol' already exists")
    val cur = struct(valueCols: _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn(prevCol, lag(cur, 1).over(w))
      // null-safe: first row has prev = NULL struct, <=> is false ⇒ kept
      .filter(!(col(prevCol) <=> cur))
      .drop(prevCol)
  }

  /** Streaming `distinctUntilChanged`: per-key last-emitted value carried
    * across micro-batches in keyed state, so a run spanning batch
    * boundaries is still one run. Rows inside a batch are ordered by
    * `order` before comparison; ACROSS batches the contract is the
    * reference's processing-time one — batches arrive in stream order
    * (same as `WindowPublisher`'s arrival-ordered windows). For full
    * event-time ordering with late data, sort + dedup in batch after
    * ingestion instead.
    *
    * Scale shape: `flatMapGroupsWithState` — one hash exchange on the
    * key per micro-batch, state is ONE value per key (not a buffer), so
    * state size is bounded by key cardinality, not stream length. */
  def distinctUntilChangedStream[R, K: Encoder, V: Encoder](
      ds: Dataset[R])(
      key: R => K,
      order: R => Long,
      value: R => V)(implicit rEnc: Encoder[R]): Dataset[R] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[V, R](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[R], state: GroupState[V]) =>
          val sorted = rows.toSeq.sortBy(order)
          val out = Seq.newBuilder[R]
          var last = state.getOption
          sorted.foreach { r =>
            val v = value(r)
            if (!last.contains(v)) { out += r; last = Some(v) }
          }
          last.foreach(state.update)
          out.result().iterator
      }
}
