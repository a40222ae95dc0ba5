package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T2–T4 batch analogues + the reference's W1 count-or-time chunking
  * (SURVEY.md §2.9, §7.5): tumbling / sliding / session windows and hybrid
  * count-or-time batching, each expressed as a batch aggregation the DuckDB
  * oracle can replay. The same window(), session_window() calls run
  * unchanged over readStream inputs (graft.streaming exercises that path
  * with watermarks); batch execution here doubles as the semantic
  * cross-check the reference never had (README.md:99 — no event time).
  *
  * Scale notes: window()/session_window() group-bys shuffle once on
  * (key, window); the sliding window fans each row into
  * windowDuration/slide=4 groups map-side — the partial aggregate absorbs
  * the 4× before the shuffle.
  */
object TimeWindowQueries extends QueryGroup {
  import H._

  val q26 = QueryDef(
    "q26_window_tumbling_1h",
    "tumbling 1h event-time window: count + value sum per hour bucket",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
        .select(tsStr(col("window.start")).as("wstart"), col("n_events"), col("sum_value"))
        .orderBy("wstart")
    },
    Some(s"""SELECT ${oTsStr("date_trunc('hour', ts)")} AS wstart,
             COUNT(*) AS n_events,
             ${oMsum("value")} AS sum_value
             FROM events GROUP BY date_trunc('hour', ts)
             ORDER BY wstart"""))

  val q27 = QueryDef(
    "q27_window_sliding_1h_15m",
    "sliding 1h window every 15m: each event lands in 4 overlapping windows " +
      "(epoch-aligned starts, exactly as streaming window() assigns them)",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
        .select(tsStr(col("window.start")).as("wstart"), col("n_events"), col("sum_value"))
        .orderBy("wstart")
    },
    // oracle replays the assignment rule: 4 candidate starts per event at
    // 15-minute steps back from the event's 15-minute bucket
    Some(s"""WITH k AS (SELECT UNNEST([0, 1, 2, 3]) AS i),
                  a AS (SELECT make_timestamp(
                          ((epoch_us(ts) // 900000000) - k.i) * 900000000) AS wstart,
                        value
                        FROM events CROSS JOIN k)
             SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart,
               COUNT(*) AS n_events,
               ${oMsum("value")} AS sum_value
             FROM a GROUP BY wstart ORDER BY wstart"""))

  val q28 = QueryDef(
    "q28_window_session_30m",
    "session windows per user with 30-minute gap via session_window(); oracle " +
      "replays the merge rule with the lag-gap-cumsum idiom",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          tsStr(col("session_window.start")).as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },
    Some(s"""WITH x AS (
               SELECT user_id, ts, value, event_id,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                      >= 1800000000 THEN 1 ELSE 0 END AS new_s
               FROM events),
             y AS (
               SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
             SELECT user_id, ${oTsStr("MIN(ts)")} AS session_start,
               COUNT(*) AS n_events, ${oMsum("value")} AS sum_value
             FROM y GROUP BY user_id, sid
             ORDER BY user_id, session_start"""))

  val q29 = QueryDef(
    "q29_chunk_count_or_time",
    "count-or-time chunking (W1 batch analogue): per-user chunks close at 10 " +
      "events or the hour boundary, whichever first — hour-aligned variant of " +
      "the reference's bufferTimeout(15, 1ms) contract (WindowPublisher.java:71)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("bucket"))
        .orderBy(col("tus"), col("event_id"))
      e.select(col("user_id"), col("event_id"), col("value"),
          date_trunc("hour", col("ts")).as("bucket"), us(col("ts")).as("tus"))
        .withColumn("chunk_no", ((row_number().over(w) - 1) / 10).cast("long"))
        .groupBy("user_id", "bucket", "chunk_no")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("tus")).as("first_us"),
          max(col("tus")).as("last_us"),
          msum(col("value")).as("sum_value"))
        .select(col("user_id"), tsStr(col("bucket")).as("bucket"), col("chunk_no"),
          col("n_events"), col("first_us"), col("last_us"), col("sum_value"))
        .orderBy("user_id", "bucket", "chunk_no")
    },
    Some(s"""WITH x AS (
               SELECT user_id, event_id, value,
                 date_trunc('hour', ts) AS bucket, epoch_us(ts) AS tus,
                 CAST((ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY epoch_us(ts), event_id) - 1) // 10 AS BIGINT) AS chunk_no
               FROM events)
             SELECT user_id, ${oTsStr("bucket")} AS bucket, chunk_no,
               COUNT(*) AS n_events,
               MIN(tus) AS first_us, MAX(tus) AS last_us,
               ${oMsum("value")} AS sum_value
             FROM x GROUP BY user_id, bucket, chunk_no
             ORDER BY user_id, bucket, chunk_no"""))

  override def queries: Seq[QueryDef] = Seq(q26, q27, q28, q29)
}
