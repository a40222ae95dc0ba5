package graft.streaming

import graft.SparkSpecBase
import graft.operators.Trend
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingCusum]] — the live change-point chart. THE contract is
  * batch equivalence: the emitted rows must carry exactly the numbers
  * [[Trend.cusum]] reports over the same finalized series (the batch
  * side computes the recursion via the reflection identity, the stream
  * runs the recursion directly — the identity proof makes them equal,
  * this spec asserts it). */
class StreamingCusumSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s buckets

  private def batchRows(series: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    Trend.cusum(
      series.toDF("slot", "x").withColumn("k", lit("k")),
      "k", "slot", "x", refSlots = 5, slack = 0.5, threshold = 4.0)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6), r.getBoolean(7)))
  }

  private def streamRows(series: Seq[(Long, Long)]): Seq[(Long, Long, Double, Double, Double, Boolean, Boolean)] = {
    var state = CusumState(Vector.empty, None, None, 0L, 0L, None, Map.empty)
    var rows = Vector.empty[CusumAlertRow]
    series.foreach { case (sl, v) =>
      val t = CusumTick("k", sl * Bucket + 1L, v.toDouble)
      val (out, next) = StreamingCusum.step(state, Seq(t), Bucket,
        wmUs = t.tsUs, refSlots = 5, slack = 0.5, threshold = 4.0,
        quantDecimals = 0)
      rows ++= out; state = next
    }
    val (tail, _) = StreamingCusum.step(state, Seq.empty, Bucket,
      Long.MaxValue / 2, 5, 0.5, 4.0, 0)
    (rows ++ tail).map(r =>
      (r.slot, r.x, r.z, r.sPos, r.sNeg, r.alarmPos, r.alarmNeg))
  }

  test("emitted rows equal the batch chart over the same series, including the reference replay") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val series = (0L until 20L).map(sl => sl -> (100L + rnd.nextInt(15)))
      assert(streamRows(series) === batchRows(series).toSeq, s"trial $trial")
    }
  }

  test("a planted shift alarms live; the reference rows appear only after the freeze") {
    val pre = (0L until 5L).map(sl => sl -> (100L + (sl % 3)))
    val shifted = pre ++ (5L until 15L).map(sl => sl -> 115L)
    val got = streamRows(shifted)
    assert(got.map(_._1) === shifted.map(_._1), "every bucket scored once frozen")
    assert(got.exists(_._6), "positive alarm after the shift")
    assert(streamRows(shifted) === batchRows(shifted).toSeq)
  }

  test("zero reference sd keeps the key permanently silent (the batch drop)") {
    val flat = (0L until 12L).map(sl => sl -> 100L)
    assert(streamRows(flat).isEmpty)
    assert(batchRows(flat).isEmpty)
  }

  test("frontier-late ticks drop; open buckets wait for the watermark") {
    var state = CusumState(Vector.empty, None, None, 0L, 0L, None, Map.empty)
    // bucket 0 closes at watermark 1s
    val (r1, s1) = StreamingCusum.step(state,
      Seq(CusumTick("k", 10L, 5.0)), Bucket, Bucket, 5, 0.5, 4.0, 0)
    assert(r1.isEmpty && s1.refBuckets === Vector(0L -> 5L))
    // a late tick for bucket 0 after it finalized must not resurrect it
    val (r2, s2) = StreamingCusum.step(s1,
      Seq(CusumTick("k", 20L, 99.0)), Bucket, Bucket, 5, 0.5, 4.0, 0)
    assert(r2.isEmpty && s2.refBuckets === Vector(0L -> 5L))
    assert(s2.open.isEmpty)
  }

  test("end-to-end: MemoryStream emissions equal the batch chart") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[CusumTick](s)
    val out = StreamingCusum(mem.toDS(), Bucket, "0 seconds", refSlots = 5)
    val q = out.writeStream.format("memory").queryName("cusum_e2e")
      .outputMode("append").start()
    try {
      val series = (0L until 10L).map(sl => sl -> (200L + (sl * 7) % 13))
      series.foreach { case (sl, v) =>
        mem.addData(CusumTick("k", sl * Bucket + 1L, v.toDouble)) }
      // one tick far ahead pushes the watermark past every bucket
      mem.addData(CusumTick("k", 100L * Bucket, 1.0))
      q.processAllAvailable()
      val got = s.table("cusum_e2e").as[CusumAlertRow].collect()
        .sortBy(_.slot)
        .map(r => (r.slot, r.x, r.z, r.sPos, r.sNeg, r.alarmPos, r.alarmNeg))
      assert(got.toSeq === batchRows(series).toSeq)
    } finally q.stop()
  }
}
