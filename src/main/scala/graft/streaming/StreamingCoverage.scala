package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One raw observation for [[StreamingCoverage]] — only the stream key
  * and the event time matter; gap accounting ignores payloads. */
final case class CoverageTick(key: String, tsUs: Long)

/** Keyed state: the highest FINALIZED observed bucket (everything at or
  * below it is immutable history) plus the still-open observed buckets
  * above it. `pending` is bounded by (watermark lag / bucket) buckets —
  * per-key constant state once the lag is fixed, the
  * [[StreamingResample]] bound. */
final case class CoverageState(lastFinal: Option[Long], pending: Set[Long])

/** One emitted gap run (append-mode, final — the watermark has passed
  * the bucket that CLOSED the gap, so no late tick can ever land inside
  * it again). */
final case class CoverageGapRow(
    key: String, gapStartSlot: Long, gapEndSlot: Long, nMissing: Long)

/** [[graft.operators.Resample.coverageGaps]] as a LIVE monitor — the
  * "stream went dark" alert emitted the moment it becomes FINAL: a gap
  * between consecutive observed buckets is provable only once the
  * watermark passes the closing bucket (a late tick inside the hole
  * could still arrive before that), so rows emit exactly then, and
  * every row is immutable (exactly-once with a checkpointed sink, the
  * T7 contract).
  *
  * Batch equivalence is THE correctness contract (spec-asserted): after
  * the stream drains and the watermark passes every observed bucket,
  * the emitted rows equal `Resample.coverageGaps` over the same ticks —
  * same bucket arithmetic, same runs. Trailing silence emits nothing
  * (a gap needs a closing observation; "still dark NOW" is a liveness
  * question for the caller's timeout policy, not a finalized fact —
  * same boundary the batch ledger draws).
  *
  * State per key: one scalar + the open-bucket set (watermark-lag
  * bounded). Key population is caller-owned, as with
  * [[StreamingFunnel]]: bounded key domains only. */
object StreamingCoverage {

  /** The pure per-key transition (extracted for property tests): fold a
    * batch of ticks into the open bucket set, then finalize every
    * bucket the watermark has passed, emitting the gap runs between
    * consecutive finalized observations. `wmUs` is the current
    * event-time watermark in micros. */
  def step(
      old: CoverageState,
      ticks: Seq[CoverageTick],
      bucketUs: Long,
      wmUs: Long): (Seq[CoverageGapRow], CoverageState) = {
    var pending = old.pending
    ticks.foreach { t =>
      val slot = Math.floorDiv(t.tsUs, bucketUs)
      // a tick at or below the finalized frontier is watermark-late;
      // history is immutable, so it cannot reopen a closed gap
      if (old.lastFinal.forall(slot > _)) pending += slot
    }
    // bucket s is final once its END is at or before the watermark:
    // (s+1)·bucket ≤ wm ⇔ s < floorDiv(wm, bucket)
    val wSlot = Math.floorDiv(wmUs, bucketUs)
    val closable = pending.filter(_ < wSlot).toSeq.sorted
    if (closable.isEmpty)
      return (Seq.empty, CoverageState(old.lastFinal, pending))
    val walk: Seq[Long] = old.lastFinal.toSeq ++ closable
    val out = walk.sliding(2).collect {
      case Seq(p, c) if c > p + 1 =>
        CoverageGapRow("", p + 1, c - 1, c - p - 1)
    }.toSeq
    (out, CoverageState(Some(closable.last), pending -- closable))
  }

  def apply(
      ds: Dataset[CoverageTick],
      bucketUs: Long,
      watermarkDelay: String)(
      implicit se: Encoder[CoverageState],
      re: Encoder[CoverageGapRow]): Dataset[CoverageGapRow] = {
    require(bucketUs > 0, s"bucketUs $bucketUs must be positive")
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val withTime = ds
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CoverageTick]
    withTime
      .groupByKey(_.key)
      .flatMapGroupsWithState[CoverageState, CoverageGapRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, ticks, state) =>
          val old = state.getOption.getOrElse(CoverageState(None, Set.empty))
          val wm = state.getCurrentWatermarkMs() * 1000L
          val (rows, next) = step(old, ticks.toSeq, bucketUs, wm)
          state.update(next)
          // re-arm on the earliest still-open close boundary (the
          // StreamingResample ceil-and-clamp rule) so empty batches
          // keep finalizing as the watermark advances
          next.pending.minOption.foreach { s =>
            val armAt = ((s + 1) * bucketUs + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(armAt, state.getCurrentWatermarkMs() + 1L))
          }
          rows.iterator.map(_.copy(key = key))
      }
  }
}
