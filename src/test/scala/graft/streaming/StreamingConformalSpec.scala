package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingConformal]] — live coverage monitoring of a deployed
  * conformal gate. THE contract is batch equivalence: drained rows'
  * counts are exact sums over each (key, slot) tick slice and
  * coverage/cov_hi reproduce the [[Quality.wilsonHi]] column arithmetic
  * bit-for-bit; breach fires exactly when even the Wilson-optimistic
  * coverage sits below the 1−α guarantee. */
class StreamingConformalSpec extends SparkSpecBase {

  private val Bucket = 1000000L

  test("step: counters accumulate; finalization emits Wilson-audited rows; " +
    "breach semantics; late drops") {
    val t = (slot: Long, score: Long, good: Boolean) =>
      ConformalTick("k", slot * Bucket + 7L, score, good)
    val s0 = ConformalState(None, Map.empty)
    // slot 0: healthy — 9/10 good pass at tau=50, alpha=1/10; slot 1:
    // collapsed — 1/10 good pass (drift no binomial noise explains)
    val healthy = (1 to 9).map(i => t(0, 50L + i, true)) :+ t(0, 10L, true)
    val collapsed = (1 to 9).map(i => t(1, 10L + i, true)) :+ t(1, 99L, true)
    val bads = Seq(t(0, 60L, false), t(0, 5L, false))
    val (r1, s1) = StreamingConformal.step(
      s0, healthy ++ collapsed ++ bads, tau = 50L, Bucket, 0L, 1, 10)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    val (r2, s2) = StreamingConformal.step(s1, Seq.empty, tau = 50L, Bucket,
      2 * Bucket, 1, 10)
    assert(r2.map(_.slot) === Seq(0L, 1L) && s2.doneSlot === Some(1L))
    val w0 = r2.head
    assert(w0.n_good === 10L && w0.good_pass === 9L)
    assert(w0.coverage === Some(0.9))
    assert(w0.n_bad === 2L && w0.bad_pass === 1L &&
      w0.false_accept_rate === Some(0.5))
    // Wilson hi of 9/10 ≈ 0.9821 ≥ 0.9 → no breach
    assert(w0.breach === Some(false))
    val w1 = r2(1)
    assert(w1.n_good === 10L && w1.good_pass === 1L)
    // Wilson hi of 1/10 ≈ 0.4042 < 0.9 → breach: not explicable as noise
    assert(w1.breach === Some(true))
    // late tick for a finalized slot drops
    val (r3, _) = StreamingConformal.step(s2,
      Seq(t(0, 99L, true)), tau = 50L, Bucket, 2 * Bucket, 1, 10)
    assert(r3.isEmpty)
    // a window with NO good rows: breach undefined, never an alarm
    val (r4, _) = StreamingConformal.step(
      ConformalState(None, Map(5L -> (0L, 0L, 3L, 1L))), Seq.empty,
      tau = 50L, Bucket, 6 * Bucket, 1, 10)
    assert(r4.head.breach.isEmpty && r4.head.coverage.isEmpty &&
      r4.head.false_accept_rate === Some(0.333333))
  }

  test("cov_hi equals the batch wilsonHi column arithmetic bit-for-bit") {
    val s = spark
    import s.implicits._
    // many (k, n) shapes including the k=0 / k=n honesty edges
    val shapes = Seq((0L, 7L), (7L, 7L), (1L, 10L), (9L, 10L), (13L, 29L),
      (1L, 1L), (0L, 1L), (999L, 1000L))
    val batch = shapes.toDF("k", "n")
      .select(col("k"), col("n"),
        round(Quality.wilsonHi(col("k"), col("n")), 6).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    shapes.foreach { case (k, n) =>
      val (rows, _) = StreamingConformal.step(
        ConformalState(None, Map(0L -> (n, k, 0L, 0L))), Seq.empty,
        tau = 0L, Bucket, Bucket, 1, 10)
      assert(rows.head.cov_hi === Some(batch((k, n))),
        s"wilsonHi mismatch at k=$k n=$n")
    }
  }

  test("end-to-end: drained MemoryStream rows equal the per-slice batch audit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val tau = 40L
    val ticks = (1 to 500).map { _ =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      val good = rnd.nextInt(4) > 0
      // good rows mostly above tau, bad mostly below — plus noise
      val score = (if (good) 30 + rnd.nextInt(40) else rnd.nextInt(50)).toLong
      ConformalTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, score, good)
    }
    val ms = MemoryStream[ConformalTick](s)
    val q = StreamingConformal(ms.toDS(), tau, Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("conf_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(ConformalTick("zz", 100 * Bucket, 0L, good = true))
      q.processAllAvailable()
      val got = s.table("conf_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
      got.foreach { case ((k, slot), r) =>
        val slice = ticks.filter(t =>
          t.key == k && Math.floorDiv(t.tsUs, Bucket) == slot)
        val gt = slice.count(_.good).toLong
        val gp = slice.count(t => t.good && t.score >= tau).toLong
        val bt = slice.count(!_.good).toLong
        val bp = slice.count(t => !t.good && t.score >= tau).toLong
        assert(r.getLong(2) === gt && r.getLong(3) === gp &&
          r.getLong(6) === bt && r.getLong(7) === bp,
          s"counts mismatch for ($k, $slot)")
        if (gt > 0) {
          val hiBatch = Seq((gp, gt)).toDF("k", "n")
            .select(round(Quality.wilsonHi(col("k"), col("n")), 6))
            .collect().head.getDouble(0)
          assert(r.getDouble(5) === hiBatch, s"cov_hi mismatch for ($k, $slot)")
          assert(r.getBoolean(9) === (hiBatch < 0.9),
            s"breach mismatch for ($k, $slot)")
        } else assert(r.isNullAt(5) && r.isNullAt(9))
      }
    } finally q.stop()
  }
}
