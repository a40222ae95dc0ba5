package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingKs]] — the live per-window two-sample KS monitor. THE
  * contract is batch equivalence: drained rows must equal
  * [[Quality.ksTest]] over each (key, slot) slice of the same ticks
  * (shared exact-integer sup-distance arithmetic — an identity, not an
  * approximation claim). */
class StreamingKsSpec extends SparkSpecBase {

  private val Bucket = 1000000L

  test("step: cells merge; watermark finalizes with the exact sup-distance; late drops") {
    val t = (slot: Long, v: Long, s: Boolean) => KsTick("k", slot * Bucket + 9L, v, s)
    val s0 = KsState(None, Map.empty)
    // fully separated supports in slot 0: D = 1 exactly
    val (r1, s1) = StreamingKs.step(s0,
      Seq(t(0, 1L, true), t(0, 2L, true), t(0, 3L, false), t(0, 4L, false),
        t(1, 7L, true)),
      Bucket, 0L, maxCells = 64)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    val (r2, s2) = StreamingKs.step(s1, Seq.empty, Bucket, 1 * Bucket, 64)
    assert(r2.map(_.slot) === Seq(0L) && s2.doneSlot === Some(0L))
    val row = r2.head
    assert(row.n1 === 2L && row.n2 === 2L && row.d_num === 4L)
    assert(row.d === Some(1.0) && row.crit === Some(1.358) &&
      row.drifted === Some(false))
    // single-sided window: undefined, never 0
    val (r3, _) = StreamingKs.step(s2, Seq.empty, Bucket, 2 * Bucket, 64)
    assert(r3.head.slot === 1L && r3.head.d.isEmpty && r3.head.drifted.isEmpty)
    // late tick for a finalized slot drops
    val (r4, s4) = StreamingKs.step(s2, Seq(t(0, 9L, true)), Bucket, 1 * Bucket, 64)
    assert(r4.isEmpty && !s4.open.contains(0L))
    // cells overflow fails loud
    val over = intercept[IllegalArgumentException] {
      StreamingKs.step(KsState(None, Map.empty),
        (0L to 4L).map(i => t(5, i, true)), Bucket, 0L, maxCells = 4)
    }
    assert(over.getMessage.contains("maxCells"))
  }

  test("end-to-end: drained MemoryStream rows equal batch ksTest per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val ticks = (1 to 600).map { _ =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      val side = rnd.nextBoolean()
      // side-dependent shift so D is informative in some windows
      val v = (rnd.nextInt(20) + (if (side) rnd.nextInt(8) else 0)).toLong
      KsTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, v, side)
    }
    val ms = MemoryStream[KsTick](s)
    val q = StreamingKs(ms.toDS(), Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("ks_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(KsTick("zz", 100 * Bucket, 0L, true)); q.processAllAvailable()
      val got = s.table("ks_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getDouble(5)),
            if (r.isNullAt(6)) None else Some(r.getDouble(6)),
            if (r.isNullAt(7)) None else Some(r.getBoolean(7)))).toMap
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
      got.keys.foreach { case (k, slot) =>
        val slice = ticks.filter(t =>
          t.key == k && Math.floorDiv(t.tsUs, Bucket) == slot)
        val b = Quality.ksTest(
            slice.map(t => (t.value, t.side)).toDF("v", "g"), "v", "g")
          .collect().head
        val (n1, n2, dn, d, crit, drifted) = got((k, slot))
        assert(n1 === b.getLong(0) && n2 === b.getLong(1) && dn === b.getLong(2),
          s"counts mismatch for ($k, $slot)")
        assert(d === (if (b.isNullAt(3)) None else Some(b.getDouble(3))))
        assert(crit === (if (b.isNullAt(4)) None else Some(b.getDouble(4))))
        assert(drifted === (if (b.isNullAt(5)) None else Some(b.getBoolean(5))),
          s"drifted mismatch for ($k, $slot)")
      }
    } finally q.stop()
  }
}
