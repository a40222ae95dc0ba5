package graft.operators

import graft.SparkSpecBase

/** [[Survival.kaplanMeier]] contracts: the textbook hand-worked table,
  * a sequential-reference equality on random censored data, censoring
  * accounting (risk-set shrink without a curve step), the absorbing
  * n = d edge, guards and partition invariance. */
class SurvivalSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  test("textbook KM table: hand-worked factors, Greenwood SE, censoring shrinks risk only") {
    // the classic 10-subject layout: events at t=1 (2), t=3 (1), t=5 (1);
    // censored at t=2 (1), t=4 (2); survivors censored at t=6 (3)
    val rows =
      Seq.fill(2)((1L, true)) ++ Seq(((2L, false))) ++ Seq((3L, true)) ++
      Seq.fill(2)((4L, false)) ++ Seq((5L, true)) ++ Seq.fill(3)((6L, false))
    val got = Survival.kaplanMeier(rows.toDF("dur", "ev"), "dur", "ev")
      .orderBy("t").collect()
    assert(got.map(_.getAs[Long]("t")).toSeq === Seq(1L, 3L, 5L))
    assert(got.map(_.getAs[Long]("n_risk")).toSeq === Seq(10L, 7L, 4L))
    assert(got.map(_.getAs[Long]("d")).toSeq === Seq(2L, 1L, 1L))
    // censoring-only times (2, 4, 6) emit NO row but shrink the risk set:
    // n_risk at 3 is 7 (10 - 2 events - 1 censored at 2)
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sequential reference with the same dec12 log-space accumulation
    val steps = Seq((10.0, 2.0), (7.0, 1.0), (4.0, 1.0))
    var lnS = BigDecimal(0); var g = BigDecimal(0)
    val want = steps.map { case (n, d) =>
      lnS += dec12(math.log((n - d) / n))
      g += dec12(d / (n * (n - d)))
      val s = math.exp(lnS.toDouble)
      (r6(s), r6(s * math.sqrt(g.toDouble)))
    }
    got.zip(want).foreach { case (r, (s, se)) =>
      assert(r.getAs[Double]("survival") === s)
      assert(r.getAs[Double]("se") === se)
      assert(r.getAs[Double]("ci_lo") <= s && s <= r.getAs[Double]("ci_hi"))
    }
    // S(1) = 0.8, S(3) = 0.8*(6/7), S(5) = that * 0.75 — sanity anchors
    assert(got(0).getAs[Double]("survival") === 0.8)
    assert(math.abs(got(2).getAs[Double]("survival") - 0.8 * 6.0 / 7.0 * 0.75)
      < 1e-6)
  }

  test("sequential reference on random censored durations; partition invariance") {
    val rnd = new scala.util.Random(59)
    val rows = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(3) > 0))
    def ref(data: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Double)] = {
      def dec12(x: Double) = BigDecimal.valueOf(x)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      def r6(x: Double) = BigDecimal.valueOf(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val byT = data.groupBy(_._1).toSeq.sortBy(_._1)
      var atRisk = data.size.toLong
      var lnS = BigDecimal(0)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double)]
      byT.foreach { case (tv, g) =>
        val d = g.count(_._2).toLong
        if (d > 0) {
          lnS += dec12(math.log((atRisk - d).toDouble / atRisk.toDouble))
          out += ((tv, atRisk, d, r6(math.exp(lnS.toDouble))))
        }
        atRisk -= g.size.toLong
      }
      out.toSeq
    }
    val want = ref(rows)
    def run(df: org.apache.spark.sql.DataFrame) =
      Survival.kaplanMeier(df, "dur", "ev").orderBy("t").collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
          r.getAs[Long]("d"), r.getAs[Double]("survival"))).toSeq
    assert(run(rows.toDF("dur", "ev")) === want)
    assert(run(rows.reverse.toDF("dur", "ev").repartition(13)) === want,
      "partition invariance of the decimal log-space accumulation")
  }

  test("logRank: sequential reference, planted separation significant, exchangeable null, guards") {
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(data: Seq[(Long, Boolean, Boolean)]): (Double, Double) = {
      val byT = data.groupBy(_._1).toSeq.sortBy(_._1)
      var r1 = data.count(_._3).toLong
      var r0 = data.size.toLong - r1
      var oe = BigDecimal(0); var v = BigDecimal(0)
      byT.foreach { case (_, g) =>
        val d1 = g.count(x => x._3 && x._2).toLong
        val d0 = g.count(x => !x._3 && x._2).toLong
        val (n1, n0) = (r1, r0); val n = n1 + n0; val d = d1 + d0
        if (d > 0) {
          oe += dec12((d1 * n - d * n1).toDouble / n.toDouble)
          if (n > 1) v += dec12(
            (d.toDouble * n1.toDouble / n.toDouble) *
              ((n - n1).toDouble / n.toDouble) *
              ((n - d).toDouble / (n.toDouble - 1.0)))
        }
        r1 -= g.count(_._3).toLong; r0 -= g.count(x => !x._3).toLong
      }
      (oe.toDouble, v.toDouble)
    }
    val rnd = new scala.util.Random(67)
    // planted separation: treatment converts ~3x later
    val planted = Seq.fill(120) {
      val treat = rnd.nextBoolean()
      val base = 1 + rnd.nextInt(8)
      val dur = if (treat) base * 3L else base.toLong
      val ev = rnd.nextInt(5) > 0
      (dur, ev, treat)
    }
    val got = Survival.logRank(planted.toDF("dur", "ev", "treat"),
      "dur", "ev", "treat").collect().head
    val (oeRef, vRef) = ref(planted)
    assert(got.getAs[Double]("o_minus_e") === r6(oeRef))
    assert(got.getAs[Double]("var_lr") === r6(vRef))
    assert(got.getAs[Double]("z") === r6(oeRef / math.sqrt(vRef)))
    assert(got.getAs[Boolean]("significant"),
      "a 3x time shift on 120 units must separate")
    assert(got.getAs[Boolean]("treat_longer") === (oeRef < 0.0))
    assert(got.getAs[Long]("n_treat") === planted.count(_._3).toLong)
    assert(got.getAs[Long]("events_treat") ===
      planted.count(x => x._3 && x._2).toLong)
    // exchangeable arms: identical (dur, ev) composition per arm
    // (pairs i=2j/2j+1 share everything except the arm) -> O-E = 0
    val nullArms = Seq.tabulate(200)(i =>
      (((i / 2) % 10).toLong + 1L, (i / 2) % 3 != 0, i % 2 == 0))
    val gn = Survival.logRank(nullArms.toDF("dur", "ev", "treat"),
      "dur", "ev", "treat").collect().head
    assert(!gn.getAs[Boolean]("significant"))
    // partition invariance
    val gp = Survival.logRank(
      planted.reverse.toDF("dur", "ev", "treat").repartition(9),
      "dur", "ev", "treat").collect().head
    assert(gp.getAs[Double]("z") === got.getAs[Double]("z"))
    // single-arm data: V = 0 -> z/significant NULL, counts live
    val solo = Survival.logRank(
      Seq((1L, true, true), (2L, true, true)).toDF("dur", "ev", "treat"),
      "dur", "ev", "treat").collect().head
    assert(solo.isNullAt(solo.fieldIndex("z")) &&
      solo.isNullAt(solo.fieldIndex("significant")))
    assert(solo.getAs[Long]("events_treat") === 2L)
    intercept[IllegalArgumentException] {
      Survival.logRank(Seq((1.0, true, true)).toDF("dur", "ev", "treat"),
        "dur", "ev", "treat")
    }
  }

  test("rmst: hand-integrated step areas, tau clamping, no-event NULL, guards") {
    // the textbook KM layout again: S = 0.8 on [1,3), 0.8*6/7 on [3,5),
    // 0.8*(6/7)*0.75 on [5, tau); initial [0,1) at S=1
    val rows =
      Seq.fill(2)((1L, true)) ++ Seq(((2L, false))) ++ Seq((3L, true)) ++
      Seq.fill(2)((4L, false)) ++ Seq((5L, true)) ++ Seq.fill(3)((6L, false))
    def r12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r12(math.exp(BigDecimal.valueOf(math.log(0.8))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble))
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val lnChain = Seq((10.0, 2.0), (7.0, 1.0), (4.0, 1.0))
      .scanLeft(BigDecimal(0)) { case (acc, (n, d)) =>
        acc + dec12(math.log((n - d) / n)) }.drop(1)
    val sv = lnChain.map(l => r12(math.exp(l.toDouble)))
    // tau = max follow-up (6, the censored tail): the largest tau the
    // curve is defined at — areas [0,1)*1 + [1,3)*S1 + [3,5)*S2 + [5,6)*S3
    val tau = 6L
    val want = r6(1.0 +
      (dec12(sv(0) * 2.0) + dec12(sv(1) * 2.0) + dec12(sv(2) * 1.0)).toDouble)
    val got = Survival.rmst(rows.toDF("dur", "ev"), "dur", "ev", tau = tau)
      .collect().head
    assert(got.getAs[Long]("tau") === 6L)
    assert(got.getAs[Long]("n_event_times") === 3L)
    assert(got.getAs[Long]("t_max") === 5L, "last EVENT time")
    assert(got.getAs[Long]("t_max_followup") === 6L, "last observed unit")
    assert(got.getAs[Double]("rmst") === want)
    // tau BEYOND max follow-up: the KM curve is undefined there — rmst
    // NULL (never a silent flat extrapolation), follow-up still emitted
    val beyond = Survival.rmst(rows.toDF("dur", "ev"), "dur", "ev", tau = 8L)
      .collect().head
    assert(beyond.getAs[Long]("t_max_followup") === 6L)
    assert(beyond.isNullAt(beyond.fieldIndex("rmst")),
      "tau=8 > max follow-up 6 must NULL rmst")
    assert(s1 === sv(0), "chain sanity")
    // tau clamping: tau below the first event -> rmst = tau exactly
    val clamp = Survival.rmst(rows.toDF("dur", "ev"), "dur", "ev", tau = 1L)
      .collect().head
    assert(clamp.getAs[Double]("rmst") === 1.0)
    // tau inside the steps: [0,1) + [1,3)S1 + [3,4)S2
    val mid = Survival.rmst(rows.toDF("dur", "ev"), "dur", "ev", tau = 4L)
      .collect().head
    assert(mid.getAs[Double]("rmst") === r6(1.0 +
      (dec12(sv(0) * 2.0) + dec12(sv(1) * 1.0)).toDouble))
    // all censored: no curve to integrate -> rmst NULL
    val noEv = Survival.rmst(
      Seq((3L, false), (5L, false)).toDF("dur", "ev"), "dur", "ev", tau = 8L)
      .collect().head
    assert(noEv.getAs[Long]("n_event_times") === 0L &&
      noEv.isNullAt(noEv.fieldIndex("rmst")))
    intercept[IllegalArgumentException](Survival.rmst(
      rows.toDF("dur", "ev"), "dur", "ev", tau = 0L))
    // partition invariance
    val gp = Survival.rmst(rows.reverse.toDF("dur", "ev").repartition(5),
      "dur", "ev", tau = tau).collect().head
    assert(gp.getAs[Double]("rmst") === want)
  }

  test("absorbing edge: whole risk set fails -> survival exactly 0, se NULL; guards") {
    // everyone dies: last time has n = d
    val all = Seq((1L, true), (1L, true), (2L, true))
    val got = Survival.kaplanMeier(all.toDF("dur", "ev"), "dur", "ev")
      .orderBy("t").collect()
    val last = got.last
    assert(last.getAs[Double]("survival") === 0.0)
    assert(last.isNullAt(last.fieldIndex("se")) &&
      last.isNullAt(last.fieldIndex("ci_lo")))
    val first = got.head
    assert(first.getAs[Double]("se") !== null)
    // all censored: no event rows at all
    assert(Survival.kaplanMeier(
      Seq((1L, false), (2L, false)).toDF("dur", "ev"), "dur", "ev")
      .collect().isEmpty)
    // negative duration raises; non-integral raises; nulls filtered
    val neg = intercept[Exception] {
      Survival.kaplanMeier(Seq((-1L, true)).toDF("dur", "ev"), "dur", "ev")
        .collect()
    }
    assert(neg.getMessage.contains("negative duration") ||
      Option(neg.getCause).exists(_.getMessage.contains("negative duration")))
    intercept[IllegalArgumentException] {
      Survival.kaplanMeier(Seq((1.0, true)).toDF("dur", "ev"), "dur", "ev")
    }
    val withNulls = Seq((Some(1L), Some(true)), (None, Some(true)),
      (Some(2L), None), (Some(1L), Some(true))).toDF("dur", "ev")
    val w = Survival.kaplanMeier(withNulls, "dur", "ev").collect()
    assert(w.length === 1 && w.head.getAs[Long]("n_risk") === 2L)
  }
}
