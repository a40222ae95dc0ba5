package graft.operators

import graft.SparkSpecBase

/** Split-conformal gate-threshold contracts: the rank rule against a
  * brute-force sorted pick, the exact-arithmetic k, the held-out
  * coverage readout, and the NULL guards. The coverage GUARANTEE
  * itself (P(score ≥ τ) ≥ 1−α marginally) is mathematics given
  * exchangeability — what the spec pins is that the estimator computes
  * the published rank exactly. */
class ConformalSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def brute(cal: Seq[Long], alphaNum: Int, alphaDen: Int): (Long, Option[Long]) = {
    val n = cal.size.toLong
    val ceil = ((n + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen
    val k = n + 1 - ceil
    (k, if (k >= 1) Some(cal.sorted.apply((k - 1).toInt)) else None)
  }

  test("rank rule matches the brute-force sorted pick; exact holdout readout") {
    // cal good = odd scores 1..99 (n=50), holdout good = even scores
    // 2..100, plus holdout bads at low scores
    val calRows = (1 to 99 by 2).map(v => (v.toLong, true, true))
    val holdGood = (2 to 100 by 2).map(v => (v.toLong, true, false))
    val holdBad = Seq(1L, 3L, 8L, 9L, 40L).map(v => (v, false, false))
    val df = (calRows ++ holdGood ++ holdBad).toDF("score", "good", "cal")
    val out = Quality.conformalGateThreshold(df, "score", "good", "cal")
      .collect().head
    val (k, tau) = brute(calRows.map(_._1), 1, 10)
    assert(out.getAs[Long]("n_cal") === 50L)
    assert(out.getAs[Long]("k") === k)
    assert(k === 5L && tau === Some(9L)) // hand-checked: 51-ceil(45.9)=5
    assert(out.getAs[Long]("tau") === 9L)
    val expectedCov = holdGood.count(_._1 >= 9L).toDouble / holdGood.size
    assert(out.getAs[Long]("good_pass") === holdGood.count(_._1 >= 9L).toLong)
    assert(math.abs(out.getAs[Double]("coverage") - expectedCov) < 1e-9)
    assert(out.getAs[Double]("coverage") >= 0.9) // the guarantee, realized
    val expectedFar = holdBad.count(_._1 >= 9L).toDouble / holdBad.size
    assert(math.abs(out.getAs[Double]("false_accept_rate") - expectedFar) < 1e-9)
  }

  test("duplicate-heavy calibration: tau from cumulative cells, not row ranks") {
    // many ties — the cells+cumsum path must land on the same value a
    // row-sorted brute force picks
    val cal = Seq.fill(30)(7L) ++ Seq.fill(15)(3L) ++ Seq.fill(5)(11L)
    val df = (cal.map(v => (v, true, true)) ++ Seq((5L, true, false)))
      .toDF("score", "good", "cal")
    val out = Quality.conformalGateThreshold(df, "score", "good", "cal",
      alphaNum = 1, alphaDen = 4).collect().head
    val (k, tau) = brute(cal, 1, 4)
    assert(out.getAs[Long]("k") === k)
    assert(out.getAs[Long]("tau") === tau.get)
  }

  test("guards: tiny calibration NULLs out; empty holdout sides NULL rates") {
    // n=3, alpha=1/10: k = 4 - ceil(3.6) = 0 -> unattainable guarantee
    val df = Seq((1L, true, true), (2L, true, true), (3L, true, true),
      (9L, true, false)).toDF("score", "good", "cal")
    val out = Quality.conformalGateThreshold(df, "score", "good", "cal")
      .collect().head
    assert(out.isNullAt(out.fieldIndex("tau")))
    assert(out.isNullAt(out.fieldIndex("coverage")))
    // attainable alpha but no held-out bad rows -> NULL false_accept_rate
    val df2 = ((1 to 20).map(v => (v.toLong, true, true)) ++
      Seq((10L, true, false))).toDF("score", "good", "cal")
    val out2 = Quality.conformalGateThreshold(df2, "score", "good", "cal",
      alphaNum = 1, alphaDen = 4).collect().head
    assert(!out2.isNullAt(out2.fieldIndex("tau")))
    assert(out2.isNullAt(out2.fieldIndex("false_accept_rate")))
    assert(!out2.isNullAt(out2.fieldIndex("coverage")))
    // non-integral score rejected loudly
    val bad = Seq((0.5, true, true)).toDF("score", "good", "cal")
    val e = intercept[IllegalArgumentException] {
      Quality.conformalGateThreshold(bad, "score", "good", "cal")
    }
    assert(e.getMessage.contains("must be integral"))
    // alpha outside (0,1) rejected
    val e2 = intercept[IllegalArgumentException] {
      Quality.conformalGateThreshold(df2, "score", "good", "cal",
        alphaNum = 5, alphaDen = 5)
    }
    assert(e2.getMessage.contains("alpha"))
  }
}
