package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One observation for [[StreamingHeavyHitters]]: stream key, event
  * time, and the item whose frequency is being watched (token, URL
  * host, user agent, source — any unbounded categorical). */
final case class HhTick(key: String, tsUs: Long, item: String)

/** Keyed state: highest FINALIZED slot + per open slot (n, counters,
  * decrements) — the Misra–Gries summary, ≤ capacity counters per
  * window by construction. */
final case class HhState(
    doneSlot: Option[Long],
    open: Map[Long, (Long, Map[String, Long], Long)])

/** One finalized heavy-hitter row: the summary estimate, the window's
  * decrement count (the per-item error bound: est ≤ true ≤ est + err),
  * and whether the window's summary is EXACT (zero decrements — the
  * distinct items fit the capacity). */
final case class HhWindowRow(
    key: String, slot: Long, rank: Long, item: String,
    est: Long, err_bound: Long, n_window: Long, exact: Boolean)

/** Live heavy-hitter monitoring over an UNBOUNDED categorical — the
  * Misra–Gries frequent-items summary (Misra & Gries 1982; the
  * mergeability analysis of Agarwal et al. 2013) per (key, window):
  * the sketch-family member the batch tier covers with exact groupBy
  * top-k (boilerplate n-grams, source mixes) but a stream cannot —
  * per-window item cardinality is unbounded, and a per-item state map
  * would grow without limit; MG keeps ≤ `capacity` counters and still
  * GUARANTEES (1) every item with true count > n/(capacity+1) is
  * present, and (2) est ≤ true ≤ est + decrements for every emitted
  * item — the deterministic error bar a drift/abuse alarm needs (a
  * CountMinSketch gives probabilistic bounds; MG's are worst-case).
  *
  * Determinism contract (stated precisely, not hand-waved): the step
  * sorts each micro-batch's ticks canonically by (tsUs, item), so the
  * transition is a pure function of the tick MULTISET per batch; the
  * summary may still depend on how the stream was cut into
  * micro-batches (inherent to any lossy mergeable summary), but the
  * two GUARANTEES above hold for ANY batch partitioning (MG's
  * invariants are merge-safe), and `exact = true` windows (zero
  * decrements) equal the batch groupBy counts exactly regardless of
  * batching — the spec-asserted contract.
  *
  * Windows finalize in slot order when watermark-FINAL (the
  * [[StreamingKs]]/[[StreamingConformal]] T7 discipline; late ticks
  * drop); emitted items order by (est desc, item) with ranks 1..m. */
object StreamingHeavyHitters {

  /** The pure per-key transition (extracted for property tests). */
  def step(
      old: HhState,
      ticks: Seq[HhTick],
      capacity: Int,
      bucketUs: Long,
      wmUs: Long): (Seq[HhWindowRow], HhState) = {
    var open = old.open
    // canonical order: the transition is a function of the multiset
    ticks.sortBy(t => (t.tsUs, t.item)).foreach { t =>
      val slot = Math.floorDiv(t.tsUs, bucketUs)
      if (old.doneSlot.forall(slot > _)) {
        val (n, m, dec) = open.getOrElse(slot, (0L, Map.empty[String, Long], 0L))
        val next =
          if (m.contains(t.item)) (n + 1L, m.updated(t.item, m(t.item) + 1L), dec)
          else if (m.size < capacity) (n + 1L, m.updated(t.item, 1L), dec)
          else {
            // the MG decrement: every counter down one, zeros evicted
            val dm = m.map { case (k, v) => k -> (v - 1L) }.filter(_._2 > 0L)
            (n + 1L, dm, dec + 1L)
          }
        open += slot -> next
      }
    }
    val wSlot = Math.floorDiv(wmUs, bucketUs)
    val closable = open.keys.filter(_ < wSlot).toSeq.sorted
    val rows = closable.flatMap { s =>
      val (n, m, dec) = open(s)
      m.toSeq.sortBy { case (item, est) => (-est, item) }.zipWithIndex.map {
        case ((item, est), i) =>
          HhWindowRow("", s, i.toLong + 1L, item, est, dec, n, dec == 0L)
      }
    }
    val nextDone = if (closable.isEmpty) old.doneSlot else Some(closable.last)
    (rows, HhState(nextDone, open -- closable))
  }

  def apply(
      ds: Dataset[HhTick],
      capacity: Int,
      bucketUs: Long,
      watermarkDelay: String,
      dropIdleAfterUs: Option[Long] = None)(
      implicit se: Encoder[HhState],
      re: Encoder[HhWindowRow]): Dataset[HhWindowRow] = {
    require(capacity >= 1 && capacity <= 4096,
      s"capacity $capacity outside [1, 4096] — the summary IS the state bound")
    require(bucketUs > 0, s"bucketUs $bucketUs must be positive")
    require(dropIdleAfterUs.forall(_ > 0L),
      s"dropIdleAfterUs $dropIdleAfterUs must be positive when set")
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val withTime = ds
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[HhTick]
    withTime
      .groupByKey(_.key)
      .flatMapGroupsWithState[HhState, HhWindowRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, ticks, state) =>
          val old = state.getOption.getOrElse(HhState(None, Map.empty))
          val wm = state.getCurrentWatermarkMs() * 1000L
          val batch = ticks.toSeq
          val (rows, next) = step(old, batch, capacity, bucketUs, wm)
          if (next.open.nonEmpty) {
            state.update(next)
            val s = next.open.keys.min
            val armAt = ((s + 1) * bucketUs + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(armAt, state.getCurrentWatermarkMs() + 1L))
          } else dropIdleAfterUs match {
            case Some(_) if state.hasTimedOut && batch.isEmpty && old.open.isEmpty =>
              state.remove()
            case Some(ttl) =>
              state.update(next)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + math.max(ttl / 1000L, 1L))
            case None =>
              state.update(next)
          }
          rows.iterator.map(_.copy(key = key))
      }
  }

  /** Drive a BATCH tick frame through the live stream and return the
    * DRAINED window frame — the q279-style oracle-witness pattern
    * applied to a streaming surface (r18 verdict item 4): feeds the
    * caller's (key, tsUs, item) rows to a MemoryStream together with an
    * ARMING far-future sentinel as one micro-batch (the first batch's
    * watermark is -inf, so nothing can drop late and nothing closes —
    * the sentinel only raises the NEXT batch's watermark), then one
    * APPLYING sentinel batch that closes every real (key, slot) window
    * at once (the watermark a batch closes against is the PREVIOUS
    * batch's maximum; state timeouts fire for keys with no new rows),
    * blocks until every window FINALIZES, and returns the emitted rows
    * minus the sentinel key — two micro-batches, the minimum (see
    * [[DrainFeed]]), with a drained frame bit-identical to the original
    * three-batch drive (per-key tick multiset per batch unchanged). With `capacity` above the per-(key, slot)
    * distinct-item count every window drains with zero decrements —
    * `exact = true` — and the MG contract makes the result a pure
    * function of the tick multiset, replayable as batch GROUP-BY SQL:
    * the registered q280 DuckDB gate. The driver-side materialization
    * is the MemoryStream feed contract (a replay/test harness, not the
    * production source path — that is `readStream` into the same
    * flatMapGroupsWithState); `maxDriveRows` caps the driven prefix
    * (first rows by (tsUs, key, item)) so the replay stays
    * driver-feasible at 100x fixture scale — a no-op at gate scales
    * (<= 100k events). */
  def drainedReplay(
      ticks: org.apache.spark.sql.DataFrame,
      capacity: Int,
      bucketUs: Long,
      maxDriveRows: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val sp = ticks.sparkSession
    import sp.implicits._
    val typed = ticks.select(
      col("key").cast("string").as("key"),
      col("tsUs").cast("long").as("tsUs"),
      col("item").cast("string").as("item")).as[HhTick]
    // one-scan drive collection (r19 optimization round): pull cap+1 rows
    // and only fall back to the ordered-prefix job when the cap is
    // actually exceeded — the previous count()-then-collect() paid two
    // full scans of the tick source on every gate-scale drive
    val firstPass = typed.limit(math.toIntExact(maxDriveRows) + 1).collect()
    val collected =
      if (firstPass.length <= maxDriveRows) firstPass
      else typed.orderBy(col("tsUs"), col("key"), col("item"))
        .limit(maxDriveRows.toInt).collect()
    val fed = collected.sortBy(t => (t.tsUs, t.key, t.item)).toIndexedSeq
    val sentinelKey = " drain"
    val lastTs = if (fed.isEmpty) 0L else fed.last.tsUs
    DrainFeed.run[HhTick, HhWindowRow](sp, fed,
        Seq(HhTick(sentinelKey, lastTs + 2L * bucketUs, "x"),
          HhTick(sentinelKey, lastTs + 4L * bucketUs, "x")),
        ds => apply(ds, capacity, bucketUs, watermarkDelay = "0 seconds"),
        "hh_drain_",
        distinctKeys = fed.iterator.map(_.key).toSet.size + 1)
      .filter(col("key") =!= sentinelKey)
  }
}
