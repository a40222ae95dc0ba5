package graft.sources

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The full production ingest topology in one spec: Kafka-shaped wire
  * rows (MemoryStream standing in for the topic) → payload decode →
  * event-time windowed aggregation under a watermark → exactly-once
  * parquet landing through the sink's commit log, across a query
  * restart. Each piece is spec'd alone elsewhere (KafkaShapedSpec,
  * WatermarkSpec, ParquetSinkSpec); this gates their COMPOSITION — the
  * pipeline a user actually deploys. */
class IngestPipelineSpec extends SparkSpecBase {

  private val payloadSchema = StructType(Seq(
    StructField("user", LongType), StructField("action", StringType)))

  test("kafka-shaped ingest -> decode -> windowed count -> parquet lands exactly once across restart") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_e2e")
    val outPath = dir.resolve("landed").toString
    val ckpt = dir.resolve("ckpt").toString

    val ms = MemoryStream[(Long, String, Timestamp, Long)](s)
    def pipeline() = {
      val wire = KafkaShaped.encode(ms.toDS().toDF("k", "v", "ts", "off"),
        "events", col("k"), col("v"), col("ts"), col("off"), numPartitions = 4)
      val counts = KafkaShaped.decodeJson(wire, payloadSchema)
        .where(!col("corrupt") && !col("tombstone"))
        .withWatermark("timestamp", "10 minutes")
        .groupBy(window(col("timestamp"), "1 hour"), col("action"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("action"), col("n"))
      ParquetSink.streamParquet(counts, outPath, ckpt,
        trigger = Trigger.AvailableNow())
    }
    def landed(): Map[(Timestamp, String), Long] =
      s.read.parquet(outPath).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) =>
          assert(vs.length === 1, s"window/action $k landed ${vs.length} times")
          k -> vs.head._2
        }

    def ts(t: String) = Timestamp.valueOf(s"2024-01-01 $t")
    // hour-10 traffic, then a watermark-advancer deep into hour 12 so
    // the 10:00 window closes and its append rows flush
    ms.addData(
      (1L, """{"user":1,"action":"view"}""", ts("10:05:00"), 0L),
      (2L, """{"user":2,"action":"view"}""", ts("10:20:00"), 1L),
      (1L, """{"user":1,"action":"buy"}""", ts("10:40:00"), 2L))
    val q1 = pipeline(); q1.awaitTermination(60000)
    ms.addData((9L, """{"user":9,"action":"tick"}""", ts("12:30:00"), 3L))
    val q2 = pipeline(); q2.awaitTermination(60000)
    // AvailableNow drains and stops each time; run once more so the
    // closed window's append rows flush to the sink
    val q3 = pipeline(); q3.awaitTermination(60000)
    val afterFirst = landed()
    assert(afterFirst((ts("10:00:00"), "view")) === 2L)
    assert(afterFirst((ts("10:00:00"), "buy")) === 1L)

    // restart from the same checkpoint with new hour-13 traffic: the
    // hour-10 rows must NOT land again (sink commit log), hour-12
    // closes and lands once
    ms.addData((9L, """{"user":9,"action":"tick"}""", ts("13:30:00"), 4L))
    val q4 = pipeline(); q4.awaitTermination(60000)
    val q5 = pipeline(); q5.awaitTermination(60000)
    val afterRestart = landed() // landed() itself asserts nothing doubled
    assert(afterRestart((ts("10:00:00"), "view")) === 2L)
    assert(afterRestart((ts("10:00:00"), "buy")) === 1L)
    assert(afterRestart((ts("12:00:00"), "tick")) === 1L)
  }
}
