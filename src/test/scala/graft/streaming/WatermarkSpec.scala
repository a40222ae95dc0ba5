package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** T5 (SURVEY.md §2.9): event-time windows + watermark late-data drop —
  * the capability the reference explicitly lacks (README.md:99). */
class WatermarkSpec extends SparkSpecBase {

  private def ts(t: String) = Timestamp.valueOf(s"2024-01-01 $t")

  test("watermark drops events later than the threshold; append emits finalized windows") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[(Timestamp, String)](s)
    val agg = ms.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .count()
      .select(col("window.start").as("wstart"), col("count"))

    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("wm_spec").start()
    try {
      ms.addData(ts("10:05:00") -> "a", ts("10:07:00") -> "b")
      q.processAllAvailable()
      // advance event time far enough to finalize [10:00, 10:10)
      ms.addData(ts("10:25:00") -> "c")
      q.processAllAvailable()
      // late arrival for the finalized window: must be dropped
      ms.addData(ts("10:03:00") -> "late")
      q.processAllAvailable()
      // advance again to finalize [10:20, 10:30)
      ms.addData(ts("10:45:00") -> "d")
      q.processAllAvailable()

      val rows = s.table("wm_spec").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(rows("2024-01-01 10:00:00.0") === 2L,
        "late event must not be counted into the finalized window")
      assert(rows("2024-01-01 10:20:00.0") === 1L)
    } finally q.stop()
  }
}
