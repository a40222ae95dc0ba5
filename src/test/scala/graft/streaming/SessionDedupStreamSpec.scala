package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** T4 in streaming mode (session_window merges under a watermark) and the
  * streaming dedup surface (O6, dropDuplicatesWithinWatermark). */
class SessionDedupStreamSpec extends SparkSpecBase {

  private def ts(t: String) = Timestamp.valueOf(s"2024-01-01 $t")

  test("streaming session_window: gap merge + finalization at watermark") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[(Timestamp, Long)](s)
    val agg = ms.toDS().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user"), session_window(col("ts"), "5 minutes"))
      .count()
      .select(col("user"), col("session_window.start").as("st"), col("count"))

    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("sess_stream").start()
    try {
      // two events 3 min apart -> one session; a third 20 min later opens
      // another and pushes the watermark past the first session's end
      ms.addData(ts("09:00:00") -> 7L, ts("09:03:00") -> 7L)
      q.processAllAvailable()
      ms.addData(ts("09:30:00") -> 7L)
      q.processAllAvailable()
      ms.addData(ts("10:00:00") -> 7L) // advance watermark to finalize session 2
      q.processAllAvailable()

      val rows = s.table("sess_stream").collect()
        .map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
      assert(rows("2024-01-01 09:00:00.0") === 2L, "3-min gap events merge into one session")
      assert(rows("2024-01-01 09:30:00.0") === 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: replays inside the horizon are dropped") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[(Timestamp, Long)](s)
    val dedup = ms.toDS().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("ddw_stream").start()
    try {
      ms.addData(ts("09:00:00") -> 100L, ts("09:00:30") -> 100L) // same id replayed
      ms.addData(ts("09:01:00") -> 101L)
      q.processAllAvailable()
      ms.addData(ts("09:02:00") -> 100L) // still within the watermark horizon
      q.processAllAvailable()

      val ids = s.table("ddw_stream").collect().map(_.getLong(1)).sorted.toSeq
      assert(ids === Seq(100L, 101L), "each id delivered exactly once within the horizon")
    } finally q.stop()
  }
}
