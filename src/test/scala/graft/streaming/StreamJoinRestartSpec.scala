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

  test("stream-stream LEFT OUTER join: null side emits only on watermark expiry, across restart") {
    // The claimed-but-untested half of J7 (r9 verdict item 4): an
    // impression with no click must (a) NOT emit while its join window
    // can still match a late click, (b) emit exactly once with a null
    // click side after the watermark passes the window end, and (c) do
    // so even when the expiry happens in a RESTARTED query — i.e. the
    // outer-join state is checkpointed, not resident.
    val s = spark
    import s.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssoj_ckpt").toString
    val imps = MemoryStream[(Timestamp, Long)](s)
    val clks = MemoryStream[(Timestamp, Long)](s)
    val joined = imps.toDS().toDF("its", "ad")
      .withWatermark("its", "10 minutes")
      .join(
        clks.toDS().toDF("cts", "ad2").withWatermark("cts", "10 minutes"),
        expr("ad = ad2 AND cts >= its AND cts <= its + interval 5 minutes"),
        "left_outer")
      .select(col("ad"), col("its"), col("cts"))
    // append-mode memory sink cannot recover from a checkpoint — collect
    // emissions through foreachBatch (which can) into a shared buffer
    val emitted = StreamJoinRestartSpec.ssojEmitted
    emitted.clear()
    def start() = joined.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.isNullAt(2)))
        emitted.synchronized { emitted ++= rows; () }
      }.start()

    val q1 = start()
    try {
      imps.addData(ts("10:00:00") -> 1L, ts("10:00:00") -> 2L)
      clks.addData(ts("10:03:00") -> 1L) // matches ad 1; ad 2 stays unmatched
      q1.processAllAvailable()
      val phase1 = emitted.synchronized(emitted.toSet)
      assert(phase1 === Set(1L -> false),
        "before watermark expiry only the MATCHED row may emit — a null-side " +
          "row now could be contradicted by a late click")
    } finally q1.stop()

    val phase1Count = emitted.synchronized(emitted.size)
    val q2 = start()
    try {
      // advance BOTH watermarks (multipleWatermarkPolicy=min) well past
      // ad 2's window end (10:05) + the 10-minute delay; the null-side
      // row flushes in a FOLLOWING batch, so feed two rounds
      imps.addData(ts("10:40:00") -> 98L)
      clks.addData(ts("10:40:00") -> 99L)
      q2.processAllAvailable()
      imps.addData(ts("10:41:00") -> 98L)
      clks.addData(ts("10:41:00") -> 99L)
      q2.processAllAvailable()
      val phase2 = emitted.synchronized(emitted.drop(phase1Count).toSet)
      assert(phase2.contains(2L -> true),
        "expired unmatched impression must emit with a null click side " +
          s"after restart (post-restart emissions: $phase2)")
      assert(!phase2.exists(_._1 == 1L),
        "the pre-restart matched row must not re-emit (exactly-once)")
    } finally q2.stop()
  }

  test("stream-stream FULL OUTER join: both unmatched sides emit on watermark expiry") {
    // J7's remaining variant: clicks with no impression (bot traffic /
    // lost impressions) must surface too, not just the left side.
    val s = spark
    import s.implicits._
    val imps = MemoryStream[(Timestamp, Long)](s)
    val clks = MemoryStream[(Timestamp, Long)](s)
    val joined = imps.toDS().toDF("its", "ad")
      .withWatermark("its", "10 minutes")
      .join(
        clks.toDS().toDF("cts", "ad2").withWatermark("cts", "10 minutes"),
        expr("ad = ad2 AND cts >= its AND cts <= its + interval 5 minutes"),
        "full_outer")
      .select(col("ad"), col("ad2"), col("its"), col("cts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssfoj_spec").start()
    try {
      imps.addData(ts("10:00:00") -> 1L, ts("10:00:00") -> 2L)
      clks.addData(ts("10:03:00") -> 1L) // matches ad 1
      clks.addData(ts("10:07:00") -> 3L) // click with NO impression
      q.processAllAvailable()
      // EMISSION TIMING: while a late match is still admissible under
      // the watermark, neither unmatched side may complete with nulls —
      // a null row now could be contradicted by a late arrival on the
      // other stream. Only the matched pair may be out.
      val early = s.table("ssfoj_spec").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      assert(!early.exists(p => p._1.isEmpty || p._2.isEmpty),
        s"no null-side completion may emit before watermark expiry: $early")
      assert(early.subsetOf(Set((Some(1L), Some(1L)))),
        s"at most the matched pair before expiry: $early")
      // advance both watermarks past every window end, twice (the
      // null-side flush lands in a following batch)
      imps.addData(ts("10:40:00") -> 98L); clks.addData(ts("10:40:00") -> 99L)
      q.processAllAvailable()
      imps.addData(ts("10:41:00") -> 98L); clks.addData(ts("10:41:00") -> 99L)
      q.processAllAvailable()
      val rows = s.table("ssfoj_spec").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      assert(rows.contains((Some(1L), Some(1L))), "matched pair emits")
      assert(rows.contains((Some(2L), None)),
        "unmatched impression emits with null click side")
      assert(rows.contains((None, Some(3L))),
        "unmatched click emits with null impression side — the full-outer half")
      // exactly-once on the completion rows: each null-side completion
      // emits a single time even across the two flush batches
      val all = s.table("ssfoj_spec").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
      assert(all.count(_ == ((Some(2L), None))) === 1,
        "null-click completion must emit exactly once")
      assert(all.count(_ == ((None, Some(3L)))) === 1,
        "null-impression completion must emit exactly once")
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

/** Companion buffer for the outer-join spec's foreachBatch sink: a
  * static field so the closure serializes a stable reference (an
  * instance field would drag the suite into the closure). */
object StreamJoinRestartSpec {
  val ssojEmitted: scala.collection.mutable.ArrayBuffer[(Long, Boolean)] =
    scala.collection.mutable.ArrayBuffer.empty
}
