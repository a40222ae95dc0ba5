package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted window: the payload batch for `key`, tagged with what closed
  * it. Mirrors the reference's `List<T>` window emission
  * (WindowPublisher.java:26,70-72) with the key and close reason made
  * explicit. Batches are never empty (empty-window suppression,
  * WindowPublisher.java:72). */
case class WindowBatch[K, E](key: K, elements: Seq[E], closedBy: String)

/** Per-batch buffer state: elements + when the current window opened. */
case class CotState[E](buf: Seq[E], openedAtMs: Long)

/** The reference's core semantic (SURVEY.md §2.2 W1, §7.5): a keyed window
  * that closes when EITHER `maxBatchSize` elements have buffered OR
  * `windowMs` has elapsed since the window opened — whichever comes first —
  * generalized from the reference's single global stream
  * (`bufferTimeout(maxSize, maxTime)`, WindowPublisher.java:70-72) to
  * per-key streams, exactly-once state, and crash recovery via the
  * Structured Streaming checkpoint (strictly stronger than the reference,
  * which loses in-flight data on crash — README.md:100).
  *
  * Implementation: `flatMapGroupsWithState` with a processing-time timeout.
  * Count closure happens synchronously on arrival; time closure fires on
  * the first trigger after the deadline, so the effective time bound is
  * windowMs + trigger interval — run with trigger ≤ windowMs/2 (SURVEY.md
  * §7.5 risk note).
  *
  * Scale: state per key is bounded by maxBatchSize elements; keys hash-
  * partition across executors; no shuffle beyond the groupByKey.
  */
object CountOrTimeWindow {

  /** The pure state transition for one flatMapGroupsWithState invocation:
    * given the buffered state, newly-arrived elements, and "now", returns
    * (count-closed emissions, next state). Extracted so the W1 invariants
    * are property-testable without a streaming harness (SURVEY.md §5.2.3):
    * losslessness, batch-size bounds, arrival-order preservation.
    *
    * @return (full batches to emit, Some((tailBuffer, openedAtMs)) if a
    *         partial buffer remains, else None)
    */
  def step[E](
      old: Option[(Seq[E], Long)],
      incoming: Seq[E],
      maxBatchSize: Int,
      nowMs: Long): (Seq[Seq[E]], Option[(Seq[E], Long)]) = {
    val buf = old.map(_._1).getOrElse(Seq.empty) ++ incoming
    val chunks = buf.grouped(maxBatchSize).toSeq
    val (full, tail) =
      if (chunks.nonEmpty && chunks.last.size < maxBatchSize)
        (chunks.dropRight(1), chunks.last)
      else (chunks, Seq.empty[E])
    val next =
      if (tail.isEmpty) None
      else {
        // window-open time carries over iff the tail still holds elements
        // of the previously open buffer (nothing emitted)
        val openedAt = if (full.isEmpty) old.map(_._2).getOrElse(nowMs) else nowMs
        Some((tail, openedAt))
      }
    (full, next)
  }

  def apply[K, E](
      ds: Dataset[E],
      keyFn: E => K,
      maxBatchSize: Int,
      windowMs: Long)(
      implicit ke: Encoder[K],
      se: Encoder[CotState[E]],
      be: Encoder[WindowBatch[K, E]]): Dataset[WindowBatch[K, E]] = {
    require(maxBatchSize > 0 && windowMs > 0)

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[CotState[E], WindowBatch[K, E]](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key, values, state) =>
          if (state.hasTimedOut) {
            // time axis: emit whatever buffered when the window's deadline
            // passed (never empty: timeouts only arm while a buffer exists)
            val buf = state.getOption.map(_.buf).getOrElse(Seq.empty)
            state.remove()
            if (buf.nonEmpty) Iterator.single(WindowBatch(key, buf, "time"))
            else Iterator.empty
          } else {
            val now = state.getCurrentProcessingTimeMs()
            val (full, next) = step(
              state.getOption.map(s => (s.buf, s.openedAtMs)), values.toSeq,
              maxBatchSize, now)
            next match {
              case Some((tail, openedAt)) =>
                state.update(CotState(tail, openedAt))
                state.setTimeoutDuration(math.max(1L, openedAt + windowMs - now))
              case None =>
                state.remove()
            }
            full.iterator.map(b => WindowBatch(key, b, "count"))
          }
      }
  }
}
