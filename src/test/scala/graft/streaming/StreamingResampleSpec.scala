package graft.streaming

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingResample]] — the streaming gap-fill. THE contract is batch
  * equivalence: once the watermark passes every observed slot, the
  * emitted rows must equal [[graft.operators.Resample.locfGrid]] over
  * the same ticks (same span, same per-slot last-non-null pick, same
  * LOCF). Asserted twice: on the pure transition with random tick
  * waves, and end-to-end through MemoryStream + event-time timers. */
class StreamingResampleSpec extends SparkSpecBase {

  private val Step = 1000000L // 1s slots

  /** Sequential reference of the batch grid for one key. */
  private def reference(ticks: Seq[ResampleTick]): Seq[(Long, Long, Option[Double], Boolean)] = {
    if (ticks.isEmpty) return Seq.empty
    val bySlot = ticks.groupBy(t => Math.floorDiv(t.tsUs, Step))
    val s0 = bySlot.keys.min; val s1 = bySlot.keys.max
    var carry: Option[Double] = None
    (s0 to s1).map { s =>
      val slotTicks = bySlot.getOrElse(s, Seq.empty)
      val lastNonNull = slotTicks.filter(_.value.isDefined)
        .sortBy(t => (t.tsUs, t.seq)).lastOption.flatMap(_.value)
      if (lastNonNull.isDefined) carry = lastNonNull
      (s, slotTicks.size.toLong, carry, slotTicks.isEmpty)
    }
  }

  test("step: drained emissions equal the batch LOCF reference on random waves") {
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { trial =>
      val ticks = (1 to 1 + rnd.nextInt(40)).map { i =>
        val slot = rnd.nextInt(25).toLong
        ResampleTick("k", slot * Step + rnd.nextInt(1000000),
          i.toLong, if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100) * 1.0))
      }
      // deliver in event-time order (what watermark filtering admits),
      // in random wave sizes, watermark trailing by a random lag
      val ordered = ticks.sortBy(_.tsUs)
      val lagUs = rnd.nextInt(3) * Step
      var state = ResampleState(None, None, Map.empty)
      var rows = Vector.empty[ResampleRow]
      var delivered = 0
      while (delivered < ordered.size) {
        val n = 1 + rnd.nextInt(5)
        val wave = ordered.slice(delivered, delivered + n)
        delivered += wave.size
        val wm = wave.map(_.tsUs).max - lagUs
        val (out, next) = StreamingResample.step(state, wave, Step, wm)
        rows ++= out
        state = next
      }
      // final drain: watermark passes everything
      val (tail, _) = StreamingResample.step(state, Seq.empty, Step, Long.MaxValue / 2)
      rows ++= tail
      val got = rows.map(r => (r.slot, r.nObs, r.value, r.filled))
      assert(got === reference(ticks).toVector, s"trial $trial")
    }
  }

  test("sub-millisecond steps: timers still drain pending slots (ceil re-arm regression)") {
    // stepUs = 500 makes slot ends land BETWEEN watermark milliseconds;
    // a floor-converted re-arm could equal the watermark ms and be
    // skipped, stranding the key's pending slots when no further ticks
    // arrive for it — the ceil+clamp re-arm must drain them
    val s = spark
    import s.implicits._
    val subStep = 500L
    val a = Seq(
      ResampleTick("a", 200L, 1L, Some(1.0)),    // slot 0
      ResampleTick("a", 1700L, 2L, Some(4.0)))   // slot 3 -> gaps 1,2
    val ms = MemoryStream[ResampleTick](s)
    val q = StreamingResample(ms.toDS(), subStep, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("rs_subms").start()
    try {
      ms.addData(a: _*); q.processAllAvailable()
      // only OTHER-key sentinels advance the watermark from here on
      (1 to 3).foreach { i =>
        ms.addData(ResampleTick("zz", 10000000L + i * 1000000L, 90L + i, Some(0.0)))
        q.processAllAvailable()
      }
      val got = s.table("rs_subms").where(col("key") === "a").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
      assert(got.toSeq === Seq((0L, 1L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 4.0)),
        "pending sub-ms slots must drain on timers alone")
    } finally q.stop()
  }

  test("soak: 20k ticks across 40 keys and 20 waves drain lossless and batch-equal") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val ticks = (1 to 20000).map { i =>
      val k = s"k${rnd.nextInt(40)}"
      val slot = rnd.nextInt(120).toLong
      ResampleTick(k, slot * Step + rnd.nextInt(1000000), i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000) * 0.5))
    }
    val ordered = ticks.sortBy(_.tsUs)
    val ms = MemoryStream[ResampleTick](s)
    val q = StreamingResample(ms.toDS(), Step, watermarkDelay = "3 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("rs_soak").start()
    try {
      ordered.grouped(1000).foreach { wave => ms.addData(wave: _*); q.processAllAvailable() }
      ms.addData(ResampleTick("zz", 1000L * Step, 1L, Some(0.0))); q.processAllAvailable()
      ms.addData(ResampleTick("zz", 1001L * Step, 2L, Some(0.0))); q.processAllAvailable()
      val streamed = s.table("rs_soak").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(r => (r._1, r._2))
      val expected = ticks.groupBy(_.key).toSeq.flatMap { case (k, ts) =>
        reference(ts).map(r => (k, r._1, r._2, r._3)) }.sortBy(r => (r._1, r._2))
      assert(streamed.length === expected.length, "row-count lossless")
      assert(streamed.toSeq === expected, "soak drain must equal the batch grid")
    } finally q.stop()
  }

  test("end-to-end: MemoryStream drain matches Resample.locfGrid; rows are final (append)") {
    val s = spark
    import s.implicits._
    val a = Seq( // key a: obs, gap, null tick, obs — plus out-of-order within slot
      ResampleTick("a", 100000L, 1L, Some(1.0)),
      ResampleTick("a", 900000L, 2L, Some(9.0)),   // same slot 0, later -> wins
      ResampleTick("a", 3100000L, 3L, None),        // slot 3: null tick
      ResampleTick("a", 5200000L, 4L, Some(5.0)))   // slot 5
    val b = Seq(
      ResampleTick("b", 2000000L, 5L, Some(7.0)))
    val ms = MemoryStream[ResampleTick](s)
    val q = StreamingResample(ms.toDS(), Step, watermarkDelay = "2 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("rs_stream").start()
    try {
      ms.addData(a.take(2) ++ b: _*); q.processAllAvailable()
      ms.addData(a.drop(2): _*); q.processAllAvailable()
      // sentinels push the watermark far past every observed slot; the
      // second one gives the timers a batch to fire in
      ms.addData(ResampleTick("zz", 100L * Step, 98L, Some(0.0))); q.processAllAvailable()
      ms.addData(ResampleTick("zz", 101L * Step, 99L, Some(0.0))); q.processAllAvailable()
      val streamed = s.table("rs_stream")
        .where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
        .sortBy(r => (r._1, r._2))
      val expected = (a.map("a" -> _) ++ b.map("b" -> _)).groupBy(_._1).toSeq
        .flatMap { case (k, ts) =>
          reference(ts.map(_._2)).map(r => (k, r._1, r._2, r._3, r._4)) }
        .sortBy(r => (r._1, r._2))
      assert(streamed.toSeq === expected,
        "drained stream must equal the batch grid")
      // and against the REAL batch operator too, not just the reference
      val batchDf = (a ++ b).toDF()
        .select(col("key"), timestamp_micros(col("tsUs")).cast("timestamp_ntz").as("ts"),
          col("value"), col("seq"))
      val batch = graft.operators.Resample.locfGrid(batchDf, Seq("key"), "ts", "value",
          Step, orderCols = Seq(col("ts"), col("seq")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .sortBy(r => (r._1, r._2))
      assert(streamed.map(r => (r._1, r._2, r._3, r._4)).toSeq === batch.toSeq,
        "streaming rows must equal the batch operator's grid")
    } finally q.stop()
  }
}
