package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with last-observation-carried-
  * forward — the gap-fill every metrics/feature pipeline needs before
  * windowed math is meaningful: irregular event ticks become one row per
  * (key, fixed-width slot) over each key's observed span, gaps filled
  * with the most recent observation (LOCF). The [[Funnel]] family reads
  * raw event time; this operator PRODUCES the regular frame those
  * downstream consumers (drift monitors, rate z-scores, training-feature
  * joins) assume.
  *
  * Shape: slotting is one exact int64 division per row (epoch-micros div
  * step — portable, never float); per-slot collapse is a grouped max_by
  * with map-side combining (one row per occupied slot travels); the grid
  * explode runs over the KEYS-sized span frame, fanning out exactly the
  * output's own size (resampling's definition — size the step to the
  * grid you intend to materialize: span/step slots per key); LOCF is a
  * streaming window frame with O(1) state (`last` ignoreNulls carries
  * one value). Nothing corpus-sized shuffles except the per-slot
  * aggregation itself.
  *
  * Null-valued ticks are TICKS without observations: they open grid
  * slots but carry no value and never SHADOW one — the per-slot pick is
  * the last NON-NULL value in the slot (a trailing null tick must not
  * discard an earlier real observation), and LOCF skips slots whose
  * ticks were all null (the SQL fill-group equivalence: cumulative
  * non-null count then per-group max; q154 replays exactly that and
  * hash-matches). Slotting is FLOOR division ([[ZOrder.floorDiv]]), so
  * pre-epoch timestamps land in negative slots exactly as SQL `//`
  * floor division places them — truncation would fold them into a
  * double-width slot 0.
  *
  * Output: (keyCols*, slot, slot_start, n_obs, <valueCol>) — slot =
  * epoch_us div stepUs, slot_start its timestamp, n_obs = ticks in the
  * slot (0 for gap rows), value = LOCF value (null only before the
  * key's first non-null observation).
  */
object Resample {

  /** Per-row array bound for the grid fan-out: the explode generates
    * slots in chunks of this many, so no single row ever materializes
    * more than a ~0.5 MB long array regardless of span (a naked
    * `sequence(s0, s1)` would build one span-sized array per key —
    * 3·10⁷ elements for a year of 1-second slots — and OOM the task
    * before the explode ever streams it). */
  private val GridChunk = 65536L

  def locfGrid(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      stepUs: Long,
      orderCols: Seq[Column] = Nil,
      maxSlotsPerKey: Long = 1L << 28): DataFrame = {
    require(stepUs > 0, s"stepUs $stepUs must be positive")
    require(keyCols.nonEmpty, "at least one key column required")
    require(maxSlotsPerKey >= 1, s"maxSlotsPerKey $maxSlotsPerKey must be >= 1")
    val keys = keyCols.map(col)
    // within-slot pick needs a TOTAL order for a well-defined "last";
    // default to the timestamp, callers add a tiebreaker for exact ties
    val ord = struct((if (orderCols.isEmpty) Seq(col(tsCol)) else orderCols): _*)
    val slot = ZOrder.floorDiv(unix_micros(col(tsCol).cast("timestamp")), lit(stepUs))
    val perSlot = df
      .select(keys ++ Seq(slot.as("slot"), col(valueCol).as("__v"), ord.as("__o")): _*)
      .groupBy(keys :+ col("slot"): _*)
      // the pick's order key is nulled out for null-valued ticks, so
      // max_by skips them: the slot value is the last NON-NULL
      // observation (null only when every tick in the slot was null)
      .agg(count(lit(1)).as("n_obs"),
        max_by(col("__v"), when(col("__v").isNotNull, col("__o"))).as("__v"))
    // per-key span: one aggregation to a keys-sized frame, then the grid
    // fan-out — exactly output-sized by construction. The fan-out is
    // guarded (a fat-finger stepUs turns an executor OOM into a clear
    // error naming the key) and CHUNKED: outer explode over GridChunk-
    // sized chunk indices, inner explode over the chunk's slots, so the
    // largest transient array is max(span/GridChunk, GridChunk) elements
    // — ≤ 65536 for any span the cap admits — instead of one span-sized
    // array per key.
    val span = col("__s1") - col("__s0") + lit(1L)
    val checkedS1 = when(span <= lit(maxSlotsPerKey), col("__s1"))
      .otherwise(raise_error(concat(
        lit("locfGrid: key ["),
        concat_ws(",", keys.map(_.cast("string")): _*),
        lit("] spans "), span.cast("string"),
        lit(s" slots > maxSlotsPerKey $maxSlotsPerKey — widen stepUs or raise the cap"))))
    val spans = perSlot.groupBy(keys: _*)
      .agg(min(col("slot")).as("__s0"), max(col("slot")).as("__s1"))
      .withColumn("__s1", checkedS1)
    val grid = spans
      .select(keys ++ Seq(col("__s0"), col("__s1"),
        explode(sequence(ZOrder.floorDiv(col("__s0"), lit(GridChunk)),
          ZOrder.floorDiv(col("__s1"), lit(GridChunk)))).as("__c")): _*)
      .select(keys :+ explode(sequence(
        greatest(col("__c") * GridChunk, col("__s0")),
        least(col("__c") * GridChunk + (GridChunk - 1), col("__s1")))).as("slot"): _*)
    val w = Window.partitionBy(keys: _*).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, keyCols :+ "slot", "left")
      .select(keys ++ Seq(
        col("slot"),
        timestamp_micros(col("slot") * stepUs).cast("timestamp_ntz").as("slot_start"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("__v"), ignoreNulls = true).over(w).as(valueCol)): _*)
  }

  /** Event-time lateness profile — the watermark-sizing tool: for each
    * event, its lateness is how far the stream's event-time HIGH WATER
    * MARK (the running max event time in ARRIVAL order) had already
    * advanced past it when it arrived; the distribution of that number
    * IS the out-of-orderness of the feed, and a streaming watermark
    * delay is chosen as "the lateness that covers all but an acceptable
    * tail" — read p99/max off this histogram instead of guessing.
    * In-order events score 0; an event 90 s behind the frontier lands
    * in the 90 s bucket and would be DROPPED by any watermark delay
    * shorter than that.
    *
    * Arrival order comes from `arrivalCol` (an ingest sequence /
    * offset / monotone id — the caller owns the claim that it reflects
    * arrival; event time alone cannot reconstruct it). Output per key:
    * one row per lateness bucket (`floorDiv(lateness, bucketUs)`),
    * with counts and the bucket's share, plus the exact max lateness —
    * model-sized, mergeable across runs by adding counts.
    *
    * Scale shape: ONE window pass per key in arrival order (running
    * max — the [[graft.operators.Funnel.sessionize]] shape on the
    * well-distributed key), then one bucket aggregation with map-side
    * combining and a keys-sized totals broadcast. */
  def latenessProfile(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      arrivalCol: String,
      bucketUs: Long,
      roundTo: Int = 4): DataFrame = {
    require(bucketUs > 0, s"latenessProfile: bucketUs $bucketUs must be > 0")
    require(keyCols.nonEmpty, "latenessProfile: at least one key column")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__arr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val uts = unix_micros(col(tsCol).cast("timestamp"))
    val late = df.where(col(tsCol).isNotNull && col(arrivalCol).isNotNull)
      .select(keys :+ uts.as("__uts") :+ col(arrivalCol).as("__arr"): _*)
      .withColumn("__frontier", max(col("__uts")).over(w))
      .select(keys :+ (col("__frontier") - col("__uts")).as("__late"): _*)
    val buckets = late
      .groupBy(keys :+ ZOrder.floorDiv(col("__late"), lit(bucketUs))
        .as("late_bucket"): _*)
      .agg(count(lit(1)).as("n"), max(col("__late")).as("__mx"))
    val totals = buckets.groupBy(keys: _*)
      .agg(sum("n").as("__tot"), max("__mx").as("__maxlate"))
    buckets.join(broadcast(totals), keyCols)
      .select(keys ++ Seq(col("late_bucket"), col("n"),
        round(col("n") * lit(1.0) / col("__tot"), roundTo).as("share"),
        col("__maxlate").as("max_lateness_us")): _*)
      .orderBy(keyCols.map(col) :+ col("late_bucket"): _*)
  }

  /** Ingest-completeness gap ledger — the missing-bucket runs of each
    * stream, WITHOUT generating the expected grid: consecutive observed
    * buckets are compared with one `lag`, and every jump > 1 bucket is a
    * gap run `[prev+1, cur−1]`. O(observed buckets) regardless of span —
    * the deliberate complement of [[locfGrid]]'s O(expected) grid (a
    * source dark for a year emits ONE ledger row here, not 3·10⁷ grid
    * rows), so this is the monitor you run ACROSS a fleet of streams to
    * decide where a backfill (or a locfGrid) is even needed.
    *
    * Output: (keys*, gap_start_slot, gap_end_slot, gap_start, n_missing)
    * — one row per gap run, slot epoch = `floorDiv(unix_micros, bucketUs)`
    * ([[locfGrid]]'s slotting, so ledgers and grids line up), `gap_start`
    * the run's first missing bucket as NTZ timestamp. Keys with no gaps
    * (or a single observed bucket) emit nothing: an EMPTY ledger is the
    * healthy state. Leading/trailing darkness is invisible by
    * construction — a stream's span is defined by its own first/last
    * observation; compare spans across keys downstream if absolute
    * coverage windows matter.
    *
    * Scale shape: one distinct-bucket aggregation (map-side combined —
    * the event log collapses to observed buckets before any window), one
    * window over the per-key bucket frame. No grid fan-out, no driver
    * state. */
  def coverageGaps(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs $bucketUs must be positive")
    require(keyCols.nonEmpty, "at least one key column required")
    val keys = keyCols.map(col)
    val slot = ZOrder.floorDiv(
      unix_micros(col(tsCol).cast("timestamp")), lit(bucketUs))
    val buckets = df.where(col(tsCol).isNotNull)
      .select(keys :+ slot.as("slot"): _*)
      .groupBy(keys :+ col("slot"): _*).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(keys: _*).orderBy("slot")
    buckets
      .withColumn("__prev", lag(col("slot"), 1).over(w))
      .where(col("__prev").isNotNull && col("slot") - col("__prev") > 1)
      .select(keys ++ Seq(
        (col("__prev") + 1).as("gap_start_slot"),
        (col("slot") - 1).as("gap_end_slot"),
        timestamp_micros((col("__prev") + 1) * bucketUs)
          .cast("timestamp_ntz").as("gap_start"),
        (col("slot") - col("__prev") - 1).as("n_missing")): _*)
  }
}
