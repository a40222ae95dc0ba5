package graft.streaming

import graft.SparkSpecBase
import graft.operators.Experiment
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingSprt]] — live sequential experiment monitoring. THE
  * contract is batch equivalence: for every drained (key, slot) row,
  * [[Experiment.sprt]] over the tick prefix with day ≤ slot reproduces
  * n / k / llr / decision / decision_day / n_at_decision /
  * llr_at_decision field-for-field; plus the latch semantics Wald's
  * guarantee prices (first crossing freezes the decision) and the
  * window discipline (in-order finalization, late drop). */
class StreamingSprtSpec extends SparkSpecBase {

  private val Bucket = 1000000L
  // p0=0.3 vs p1=0.7, alpha=beta=0.05 — fast boundaries for fixtures
  private val (la, lb, ua, ub) = Experiment.sprtConstants(0.3, 0.7, 0.05, 0.05)

  private def t(slot: Long, conv: Boolean) =
    SprtTick("k", slot * Bucket + 3L, conv)
  private val s0 = SprtState(None, Map.empty, 0L, 0L, None)

  test("step: in-order finalization, H1 latch freezes against re-crossing, late drop") {
    // slot 0: 8/8 successes — LLR crosses ua; slot 1: 12 failures — LLR
    // would re-cross down, but the decision stays latched at slot 0
    val ticks = (1 to 8).map(_ => t(0, true)) ++ (1 to 12).map(_ => t(1, false))
    val (r1, s1) = StreamingSprt.step(s0, ticks, Bucket, 0L, la, lb, ua, ub)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    val (r2, s2) = StreamingSprt.step(s1, Seq.empty, Bucket, 2 * Bucket,
      la, lb, ua, ub)
    assert(r2.map(_.slot) === Seq(0L, 1L))
    val w0 = r2.head
    assert(w0.n === 8L && w0.k === 8L && w0.state === "accept_h1")
    assert(w0.decision === Some("accept_h1") && w0.decision_slot === Some(0L) &&
      w0.n_at_decision === Some(8L))
    val llr0 = 8.0 * la + 0.0 * lb
    assert(w0.llr === BigDecimal(llr0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    val w1 = r2(1)
    assert(w1.n === 20L && w1.k === 8L)
    // current state re-crossed down, but the latch holds slot 0's call
    assert(w1.state === "accept_h0" && w1.decision === Some("accept_h1") &&
      w1.decision_slot === Some(0L) && w1.n_at_decision === Some(8L))
    // late tick for a finalized slot drops; nothing re-emits
    val (r3, s3) = StreamingSprt.step(s2, Seq(t(0, true)), Bucket,
      2 * Bucket, la, lb, ua, ub)
    assert(r3.isEmpty && s3.cumN === 20L, "late tick must not mutate counters")
  }

  test("step: prefix equivalence against the batch operator on a planted continue stream") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    // ~0.5 rate between p0 and p1: the test keeps running — every slot
    // emits a continue row the batch prefix must reproduce
    val ticks = for (slot <- 0L to 5L; _ <- 1 to 10)
      yield t(slot, rnd.nextBoolean())
    val (rows, _) = StreamingSprt.step(s0, ticks, Bucket, 6 * Bucket,
      la, lb, ua, ub)
    assert(rows.size === 6)
    rows.foreach { r =>
      val prefix = ticks.filter(x => Math.floorDiv(x.tsUs, Bucket) <= r.slot)
        .map(x => (1L, Math.floorDiv(x.tsUs, Bucket), x.conv))
      val b = Experiment.sprt(prefix.toDF("variant", "day", "conv"),
        "variant", "day", "conv", p0 = 0.3, p1 = 0.7).collect().head
      assert(r.n === b.getAs[Long]("n") && r.k === b.getAs[Long]("k"),
        s"slot ${r.slot} counts")
      assert(r.llr === b.getAs[Double]("llr_final"), s"slot ${r.slot} llr")
      assert(r.decision.getOrElse("continue") === b.getAs[String]("decision"))
      if (r.decision.isDefined) {
        assert(r.decision_slot.get === b.getAs[Long]("decision_day"))
        assert(r.n_at_decision.get === b.getAs[Long]("n_at_decision"))
        assert(r.llr_at_decision.get === b.getAs[Double]("llr_at_decision"))
      } else assert(b.isNullAt(b.fieldIndex("decision_day")))
    }
  }

  test("end-to-end: drained MemoryStream rows equal the batch prefix audit per key") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(41)
    // variant a converts at ~0.75 (should accept H1), b at ~0.25 (H0)
    val ticks = (1 to 400).map { _ =>
      val key = if (rnd.nextBoolean()) "a" else "b"
      val slot = rnd.nextInt(4).toLong
      val conv = rnd.nextInt(100) < (if (key == "a") 75 else 25)
      SprtTick(key, slot * Bucket + rnd.nextInt(1000000).toLong, conv)
    }
    val ms = MemoryStream[SprtTick](sp)
    val q = StreamingSprt(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        p0 = 0.3, p1 = 0.7)
      .writeStream.outputMode("append").format("memory")
      .queryName("sprt_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(SprtTick("zz", 100 * Bucket, conv = true))
      q.processAllAvailable()
      val got = sp.table("sprt_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
      assert(got.keySet.map(_._1) === Set("a", "b"))
      // both planted rates are decisive well inside 4 slots
      assert(got.exists(_._2.getAs[String]("decision") == "accept_h1"))
      assert(got.exists(_._2.getAs[String]("decision") == "accept_h0"))
      got.foreach { case ((k, slot), r) =>
        val prefix = ticks.filter(x =>
            x.key == k && Math.floorDiv(x.tsUs, Bucket) <= slot)
          .map(x => (1L, Math.floorDiv(x.tsUs, Bucket), x.conv))
        val b = Experiment.sprt(prefix.toDF("variant", "day", "conv"),
          "variant", "day", "conv", p0 = 0.3, p1 = 0.7).collect().head
        assert(r.getLong(2) === b.getAs[Long]("n") &&
          r.getLong(3) === b.getAs[Long]("k"), s"($k, $slot) counts")
        assert(r.getDouble(4) === b.getAs[Double]("llr_final"),
          s"($k, $slot) llr")
        val dec = if (r.isNullAt(6)) "continue" else r.getString(6)
        assert(dec === b.getAs[String]("decision"), s"($k, $slot) decision")
        if (!r.isNullAt(6)) {
          assert(r.getLong(7) === b.getAs[Long]("decision_day"))
          assert(r.getLong(8) === b.getAs[Long]("n_at_decision"))
          assert(r.getDouble(9) === b.getAs[Double]("llr_at_decision"))
        }
      }
    } finally q.stop()
  }
}
