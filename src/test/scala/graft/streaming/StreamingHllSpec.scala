package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingHll]] — the live per-window cardinality sketch. THE
  * contract is batch equivalence: drained rows must equal
  * [[Sketches.hllDistinct]] grouped by (key, slot) over the same ticks,
  * register for register (the shared avalanche hash makes that an
  * identity, not an approximation claim). */
class StreamingHllSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s windows

  test("register: JVM rule equals the batch Catalyst rule on the same hash") {
    val s = spark
    import s.implicits._
    val members = (1 to 200).map(i => s"user$i")
    // batch registers via the expression path
    val batch = Sketches.hllDistinct(
        members.map(m => ("g", m)).toDF("g", "member"), "g", "member",
        m = 64, salt = "s1")
      .collect().head
    // JVM registers via StreamingHll.register
    val regs = Array.fill(64)(0)
    members.foreach { mStr =>
      val (j, rho) = StreamingHll.register(mStr, "s1")
      regs(j) = math.max(regs(j), rho)
    }
    val sScaled = regs.map(r => 1L << (27 - r)).sum
    assert(batch.getLong(3) === sScaled, "s_scaled must match bit-exactly")
    assert(batch.getLong(2) === regs.count(_ == 0).toLong)
  }

  test("step: max-merge registers; watermark finalizes; late ticks drop") {
    val t = (slot: Long, m: String) => HllTick("k", slot * Bucket + 10L, m)
    val s0 = HllState(None, Map.empty)
    val (r1, s1) = StreamingHll.step(s0,
      Seq(t(0, "a"), t(0, "b"), t(1, "c")), Bucket, "s", 0L)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    // watermark past slot 0's end finalizes exactly slot 0
    val (r2, s2) = StreamingHll.step(s1, Seq.empty, Bucket, "s", 1 * Bucket)
    assert(r2.map(_.slot) === Seq(0L) && s2.doneSlot === Some(0L))
    assert(s2.open.keySet === Set(1L))
    // a late tick for the finalized slot must not resurrect it
    val (r3, s3) = StreamingHll.step(s2,
      Seq(t(0, "zzz")), Bucket, "s", 1 * Bucket)
    assert(r3.isEmpty && !s3.open.contains(0L))
    // duplicate members change nothing: registers are a set function
    val (_, s4a) = StreamingHll.step(s3, Seq(t(1, "c"), t(1, "c")), Bucket, "s", 0L)
    assert(s4a.open(1L) === s3.open(1L))
  }

  test("end-to-end: drained MemoryStream rows equal the batch sketch per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val ticks = (1 to 400).map { _ =>
      val slot = rnd.nextInt(4).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      HllTick(key, slot * Bucket + rnd.nextInt(1000000).toLong,
        s"m${rnd.nextInt(500)}")
    }
    val ms = MemoryStream[HllTick](s)
    val q = StreamingHll(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        salt = "e2e")
      .writeStream.outputMode("append").format("memory")
      .queryName("hll_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(HllTick("zz", 100 * Bucket, "x")); q.processAllAvailable()
      val got = s.table("hll_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      // batch twin: hllDistinct grouped by the composite (key, slot)
      val batch = Sketches.hllDistinct(
          ticks.toDF().select(
            concat_ws("|", col("key"),
              (col("tsUs") / Bucket).cast("long")).as("g"),
            col("member")),
          "g", "member", m = 64, salt = "e2e")
        .collect().map { r =>
          val Array(k, sl) = r.getString(0).split('|')
          (k, sl.toLong) -> (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4))
        }.toMap
      assert(got === batch,
        s"stream rows must equal the batch sketch: got ${got.size}, batch ${batch.size}")
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
    } finally q.stop()
  }

  test("dropIdleAfterUs: idle keys retire through the TTL path; revived keys keep emitting") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[HllTick](s)
    val q = StreamingHll(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        salt = "ttl", dropIdleAfterUs = Some(Bucket)) // retire after 1s idle
      .writeStream.outputMode("append").format("memory")
      .queryName("hll_ttl").start()
    try {
      // key a fills slot 0; unrelated keys then march the watermark
      // forward so (1) the close-boundary arm fires, (2) the idle TTL
      // arm fires and REMOVES a's state, (3) a revives fresh
      ms.addData(HllTick("a", 10L, "m1"), HllTick("a", 20L, "m2"))
      q.processAllAvailable()
      ms.addData(HllTick("wm1", 10 * Bucket, "x")); q.processAllAvailable()
      ms.addData(HllTick("wm2", 20 * Bucket, "x")); q.processAllAvailable()
      ms.addData(HllTick("wm3", 30 * Bucket, "x")); q.processAllAvailable()
      ms.addData(HllTick("a", 40 * Bucket + 5L, "m3")); q.processAllAvailable()
      ms.addData(HllTick("wm4", 50 * Bucket, "x")); q.processAllAvailable()
      ms.addData(HllTick("wm5", 60 * Bucket, "x")); q.processAllAvailable()
      val slots = s.table("hll_ttl").where(col("key") === "a").collect()
        .map(_.getLong(1)).sorted.toSeq
      assert(slots === Seq(0L, 40L),
        s"pre-retirement and revived windows each finalize exactly once, got $slots")
    } finally q.stop()
  }
}
