package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** J7 (stream-stream join with watermarks) and T7 (exactly-once recovery
  * from checkpoint) — SURVEY.md §2.4/§2.9. T7 is strictly stronger than
  * the reference, which documents in-flight data loss on crash
  * (README.md:100). */
class StreamJoinRestartSpec extends SparkSpecBase {

  private def ts(t: String) = Timestamp.valueOf(s"2024-01-01 $t")

  test("stream-stream inner join: clicks attribute to impressions within the window") {
    val s = spark
    import s.implicits._
    val imps = MemoryStream[(Timestamp, Long)](s)
    val clks = MemoryStream[(Timestamp, Long)](s)
    val joined = imps.toDS().toDF("its", "ad")
      .withWatermark("its", "10 minutes")
      .join(
        clks.toDS().toDF("cts", "ad2").withWatermark("cts", "10 minutes"),
        expr("ad = ad2 AND cts >= its AND cts <= its + interval 5 minutes"))
      .select(col("ad"), col("its"), col("cts"))

    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_spec").start()
    try {
      imps.addData(ts("10:00:00") -> 1L, ts("10:00:00") -> 2L)
      clks.addData(ts("10:03:00") -> 1L) // inside 5-min window for ad 1
      clks.addData(ts("10:09:00") -> 2L) // outside window for ad 2
      q.processAllAvailable()
      val rows = s.table("ssj_spec").collect().map(_.getLong(0)).toSeq
      assert(rows === Seq(1L), "only the in-window click joins")
    } finally q.stop()
  }

  test("exactly-once: aggregation state survives stop + restart from checkpoint") {
    val s = spark
    import s.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt").toString
    val ms = MemoryStream[String](s)
    val counts = ms.toDS().groupBy("value").count()
    def start() = counts.writeStream.outputMode("complete").format("memory")
      .queryName("eo_spec").option("checkpointLocation", ckpt).start()

    val q1 = start()
    ms.addData("a", "b", "a")
    q1.processAllAvailable()
    q1.stop()

    ms.addData("a", "c") // arrives while the query is down
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = s.table("eo_spec").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out === Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
        "pre-restart state recovered, offline arrivals replayed exactly once")
    } finally q2.stop()
  }
}
