package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingAms]] — the live per-window F₂ sketch. THE contract is
  * batch equivalence: drained rows must equal [[Sketches.amsF2]] over
  * each (key, slot) slice of the same ticks, counter for counter (the
  * shared avalanche hash makes that an identity, not an approximation
  * claim). */
class StreamingAmsSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s windows

  test("sign: JVM parity rule equals the batch Catalyst rule, cell for cell") {
    val s = spark
    import s.implicits._
    val members = (1 to 150).map(i => s"m${i % 40}")
    val batch = Sketches.amsSketch(
        members.toDF("member"), "member", depth = 3, reps = 8, salt = "s1")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val jvm = Array.fill(24)(0L)
    members.foreach { m =>
      (0 until 24).foreach(i => jvm(i) += StreamingAms.sign(m, "s1", i))
    }
    (0 until 24).foreach { i =>
      assert(batch((i / 8, i % 8)) === jvm(i),
        s"counter $i must match bit-exactly")
    }
  }

  test("step: sum-merge counters; watermark finalizes; late ticks drop") {
    val t = (slot: Long, m: String) => AmsTick("k", slot * Bucket + 10L, m)
    val s0 = AmsState(None, Map.empty)
    val (r1, s1) = StreamingAms.step(s0,
      Seq(t(0, "a"), t(0, "a"), t(1, "c")), Bucket, "s", 0L)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    // duplicates double the contribution: AMS is a frequency sketch,
    // slot 0's counters are exactly 2 × one "a" tick's signs
    (0 until 24).foreach { i =>
      assert(s1.open(0L)(i) === 2L * StreamingAms.sign("a", "s", i))
    }
    // watermark past slot 0's end finalizes exactly slot 0
    val (r2, s2) = StreamingAms.step(s1, Seq.empty, Bucket, "s", 1 * Bucket)
    assert(r2.map(_.slot) === Seq(0L) && s2.doneSlot === Some(0L))
    assert(s2.open.keySet === Set(1L))
    // s_med for a single duplicated member: every z = ±2, z² = 4,
    // every group sum = 32, est = 32/8 = 4 = f² exactly
    assert(r2.head.s_med === 32L && r2.head.est_f2 === 4.0)
    // a late tick for the finalized slot must not resurrect it
    val (r3, s3) = StreamingAms.step(s2,
      Seq(t(0, "zzz")), Bucket, "s", 1 * Bucket)
    assert(r3.isEmpty && !s3.open.contains(0L))
  }

  test("finalize: int64-exactness guard fires at |z| = 2^30, passes below") {
    // the group sum adds Reps=8 squares in plain Long: 8·(2^31−1)² wraps,
    // so the guard must reject |z| ≥ 2^30 (8·(2^30−1)² = 2^63−2^34+8 fits)
    val hot = AmsState(None, Map(0L -> Vector.fill(24)(1L << 30)))
    val ex = intercept[IllegalArgumentException] {
      StreamingAms.step(hot, Seq.empty, Bucket, "s", 1 * Bucket)
    }
    assert(ex.getMessage.contains("int64-exact"))
    // one tick below the bound: finalizes without wrapping — every group
    // sum is 8·(2^30−1)², positive and exact
    val edge = (1L << 30) - 1L
    val (rows, _) = StreamingAms.step(
      AmsState(None, Map(0L -> Vector.fill(24)(edge))),
      Seq.empty, Bucket, "s", 1 * Bucket)
    assert(rows.head.s_med === 8L * edge * edge && rows.head.s_med > 0L)
  }

  test("end-to-end: drained MemoryStream rows equal the batch sketch per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val ticks = (1 to 400).map { _ =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      AmsTick(key, slot * Bucket + rnd.nextInt(1000000).toLong,
        s"m${rnd.nextInt(25)}")
    }
    val ms = MemoryStream[AmsTick](s)
    val q = StreamingAms(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        salt = "e2e")
      .writeStream.outputMode("append").format("memory")
      .queryName("ams_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(AmsTick("zz", 100 * Bucket, "x")); q.processAllAvailable()
      val got = s.table("ams_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
      // batch twin per slice: amsF2 over exactly that (key, slot)'s ticks
      got.keys.foreach { case (k, slot) =>
        val slice = ticks.filter(t =>
          t.key == k && Math.floorDiv(t.tsUs, Bucket) == slot)
        val b = Sketches.amsF2(slice.toDF().select(col("member")),
            "member", depth = 3, reps = 8, salt = "e2e")
          .collect().head
        val (d, r8, sMed, est) = got((k, slot))
        assert(d === b.getLong(0) && r8 === b.getLong(1))
        assert(sMed === b.getDecimal(2).longValueExact(),
          s"s_med mismatch for ($k, $slot)")
        assert(est === b.getDouble(3), s"est_f2 mismatch for ($k, $slot)")
      }
    } finally q.stop()
  }

  test("dropIdleAfterUs: idle keys retire through the TTL path; revived keys keep emitting") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[AmsTick](s)
    val q = StreamingAms(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        salt = "ttl", dropIdleAfterUs = Some(Bucket))
      .writeStream.outputMode("append").format("memory")
      .queryName("ams_ttl").start()
    try {
      ms.addData(AmsTick("a", 10L, "m1"), AmsTick("a", 20L, "m2"))
      q.processAllAvailable()
      ms.addData(AmsTick("wm1", 10 * Bucket, "x")); q.processAllAvailable()
      ms.addData(AmsTick("wm2", 20 * Bucket, "x")); q.processAllAvailable()
      ms.addData(AmsTick("wm3", 30 * Bucket, "x")); q.processAllAvailable()
      ms.addData(AmsTick("a", 40 * Bucket + 5L, "m3")); q.processAllAvailable()
      ms.addData(AmsTick("wm4", 50 * Bucket, "x")); q.processAllAvailable()
      ms.addData(AmsTick("wm5", 60 * Bucket, "x")); q.processAllAvailable()
      val slots = s.table("ams_ttl").where(col("key") === "a").collect()
        .map(_.getLong(1)).sorted.toSeq
      assert(slots === Seq(0L, 40L),
        s"pre-retirement and revived windows each finalize exactly once, got $slots")
    } finally q.stop()
  }
}
