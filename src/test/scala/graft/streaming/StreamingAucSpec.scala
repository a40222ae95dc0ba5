package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingAuc]] — the live per-window eval monitor. THE contract is
  * batch equivalence: drained rows must equal [[Quality.rocAuc]] and the
  * ECE of [[Quality.calibrationCurve]] over each (key, slot) slice of
  * the same ticks (the shared cells-frame arithmetic makes that an
  * identity, not an approximation claim). */
class StreamingAucSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s windows

  test("step: cells merge by component sum; watermark finalizes; late ticks drop") {
    val t = (slot: Long, sc: Long, y: Boolean) =>
      AucTick("k", slot * Bucket + 10L, sc, y)
    val s0 = AucState(None, Map.empty)
    val (r1, s1) = StreamingAuc.step(s0,
      Seq(t(0, 800000L, true), t(0, 800000L, true), t(0, 300000L, false),
        t(1, 500000L, true)),
      Bucket, 0L, maxCells = 64)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    assert(s1.open(0L) === Map(800000L -> ((2L, 0L)), 300000L -> ((0L, 1L))))
    // watermark past slot 0's end finalizes exactly slot 0: the one
    // negative scores strictly below both positives ⇒ U = 2, AUC = 1
    val (r2, s2) = StreamingAuc.step(s1, Seq.empty, Bucket, 1 * Bucket, 64)
    assert(r2.map(_.slot) === Seq(0L) && s2.doneSlot === Some(0L))
    val row = r2.head
    assert(row.n === 3L && row.n_pos === 2L && row.n_neg === 1L)
    assert(row.u2 === 4L && row.auc === Some(1.0))
    // ECE by hand: bin 8 (two pos at conf .8): |2e6 − 1.6e6| = 4e5;
    // bin 3 (one neg at conf .3): |0 − 3e5| = 3e5 ⇒ 7e5 / 3e6 = 0.233333
    assert(row.ece === Some(0.233333))
    // a late tick for the finalized slot must not resurrect it
    val (r3, s3) = StreamingAuc.step(s2, Seq(t(0, 100000L, true)),
      Bucket, 1 * Bucket, 64)
    assert(r3.isEmpty && !s3.open.contains(0L))
  }

  test("guards: out-of-range scores and cells overflow fail loud") {
    val s0 = AucState(None, Map.empty)
    val bad = intercept[IllegalArgumentException] {
      StreamingAuc.step(s0, Seq(AucTick("k", 10L, 1000001L, true)),
        Bucket, 0L, 64)
    }
    assert(bad.getMessage.contains("micro-probability"))
    intercept[IllegalArgumentException] {
      StreamingAuc.step(s0, Seq(AucTick("k", 10L, -1L, false)),
        Bucket, 0L, 64)
    }
    val over = intercept[IllegalArgumentException] {
      StreamingAuc.step(s0,
        (0L to 4L).map(i => AucTick("k", 10L, i * 1000L, true)),
        Bucket, 0L, maxCells = 4)
    }
    assert(over.getMessage.contains("maxCells"))
  }

  test("end-to-end: drained MemoryStream rows equal batch rocAuc + calibration ECE per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val ticks = (1 to 600).map { _ =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      // coarse 20-level quantization — the distinct-score contract
      val score = rnd.nextInt(21).toLong * 50000L
      // correlated label so AUC is informative, not 0.5 noise
      val label = rnd.nextInt(1000000) < (200000 + score / 2)
      AucTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, score, label)
    }
    val ms = MemoryStream[AucTick](s)
    val q = StreamingAuc(ms.toDS(), Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("auc_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(AucTick("zz", 100 * Bucket, 0L, false)); q.processAllAvailable()
      val got = s.table("auc_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getDouble(6)),
            if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
      got.keys.foreach { case (k, slot) =>
        val slice = ticks.filter(t =>
          t.key == k && Math.floorDiv(t.tsUs, Bucket) == slot)
        val df = slice.map(t => (t.score, t.label)).toDF("score", "y")
        val b = Quality.rocAuc(df, "score", "y").collect().head
        val (n, np, nn, u2, auc, ece) = got((k, slot))
        assert(n === b.getLong(0) && np === b.getLong(1) && nn === b.getLong(2))
        assert(u2 === b.getDecimal(3).longValueExact(),
          s"u2 mismatch for ($k, $slot)")
        assert(auc === (if (b.isNullAt(4)) None else Some(b.getDouble(4))),
          s"auc mismatch for ($k, $slot)")
        val bEce = Quality.calibrationCurve(df, "score", "y")
          .select(col("ece")).limit(1).collect().headOption.map(_.getDouble(0))
        assert(ece === bEce, s"ece mismatch for ($k, $slot)")
      }
    } finally q.stop()
  }
}
