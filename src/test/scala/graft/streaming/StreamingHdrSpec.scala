package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingHdr]] — the live per-window quantile sketch. THE contract
  * is batch equivalence: drained rows must equal
  * [[Sketches.hdrQuantiles]] grouped by (key, slot) over the same
  * ticks — identical integer bucketing, identical rank rule. */
class StreamingHdrSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s windows
  private val Qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  test("bounds: JVM twin equals the batch integer bucketing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val vs = Seq(0L, 1L, 31L, 32L, 1023L) ++
      Seq.fill(300)(math.abs(rnd.nextLong()) % 800000000L)
    val batch = Sketches.withHdrBounds(vs.toDF("v"), "v", 5)
      .select("v", "lo", "hi").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    vs.foreach { v =>
      assert(StreamingHdr.bounds(v, 5) === batch(v), s"v=$v")
    }
    intercept[IllegalArgumentException](StreamingHdr.bounds(-1L, 5))
  }

  test("step: counts fold; watermark finalizes with the batch rank rule; late drops") {
    val t = (slot: Long, v: Long) => HdrTick("k", slot * Bucket + 7L, v)
    val s0 = HdrState(None, Map.empty)
    val (r1, s1) = StreamingHdr.step(s0,
      (1L to 100L).map(v => t(0, v)) :+ t(1, 5L), Bucket, 5, Qs, 0L)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    val (r2, s2) = StreamingHdr.step(s1, Seq.empty, Bucket, 5, Qs, Bucket)
    assert(r2.map(_.q_name).sorted === Seq("p50", "p90", "p99"))
    // values 1..100, subBits 5: p50 -> k=50; bucket of 50 is [48, 51]
    val p50 = r2.find(_.q_name == "p50").get
    assert(p50.n === 100L && p50.bucket_lo <= 50L && 50L <= p50.bucket_hi)
    // late tick for the finalized slot drops
    val (r3, s3) = StreamingHdr.step(s2, Seq(t(0, 9L)), Bucket, 5, Qs, Bucket)
    assert(r3.isEmpty && !s3.open.contains(0L))
  }

  test("end-to-end: drained MemoryStream rows equal the batch sketch per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val ticks = (1 to 600).map { _ =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      HdrTick(key, slot * Bucket + rnd.nextInt(1000000).toLong,
        math.abs(rnd.nextLong()) % 10000000L)
    }
    val ms = MemoryStream[HdrTick](s)
    val q = StreamingHdr(ms.toDS(), Bucket, watermarkDelay = "0 seconds", Qs)
      .writeStream.outputMode("append").format("memory")
      .queryName("hdr_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(HdrTick("zz", 100 * Bucket, 1L)); q.processAllAvailable()
      val got = s.table("hdr_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)) ->
          (r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      val batch = Sketches.hdrQuantiles(
          ticks.toDF().select(
            concat_ws("|", col("key"),
              (col("tsUs") / Bucket).cast("long")).as("g"),
            col("value")),
          "g", "value", Qs, subBits = 5)
        .collect().map { r =>
          val Array(k, sl) = r.getString(0).split('|')
          (k, sl.toLong, r.getString(1)) ->
            (r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))
        }.toMap
      assert(got === batch,
        s"stream rows must equal the batch sketch: got ${got.size}, batch ${batch.size}")
      assert(got.size === 18, "3 slots x 2 keys x 3 quantiles")
    } finally q.stop()
  }

  test("dropIdleAfterUs: idle keys retire through the TTL path; revived keys keep emitting") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[HdrTick](s)
    val q = StreamingHdr(ms.toDS(), Bucket, watermarkDelay = "0 seconds", Qs,
        dropIdleAfterUs = Some(Bucket))
      .writeStream.outputMode("append").format("memory")
      .queryName("hdr_ttl").start()
    try {
      ms.addData(HdrTick("a", 10L, 5L), HdrTick("a", 20L, 7L))
      q.processAllAvailable()
      ms.addData(HdrTick("wm1", 10 * Bucket, 1L)); q.processAllAvailable()
      ms.addData(HdrTick("wm2", 20 * Bucket, 1L)); q.processAllAvailable()
      ms.addData(HdrTick("wm3", 30 * Bucket, 1L)); q.processAllAvailable()
      ms.addData(HdrTick("a", 40 * Bucket + 5L, 9L)); q.processAllAvailable()
      ms.addData(HdrTick("wm4", 50 * Bucket, 1L)); q.processAllAvailable()
      ms.addData(HdrTick("wm5", 60 * Bucket, 1L)); q.processAllAvailable()
      val slots = s.table("hdr_ttl").where(col("key") === "a").collect()
        .map(_.getLong(1)).distinct.sorted.toSeq
      assert(slots === Seq(0L, 40L),
        s"pre-retirement and revived windows each finalize exactly once, got $slots")
    } finally q.stop()
  }
}
