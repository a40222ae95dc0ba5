package graft.operators

import graft.SparkSpecBase

/** Wald SPRT contracts against a brute sequential computation: H1 and
  * H0 boundary crossings at the right day with the right cumulative n,
  * the continue state, within-day order irrelevance, and the argument
  * gates. */
class SprtSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private val P0 = 0.1; private val P1 = 0.3
  private val (la, lb, ua, ub) = Experiment.sprtConstants(P0, P1, 0.05, 0.05)

  /** Brute day-boundary SPRT: (decisionDay, nAtDecision, state). */
  private def brute(days: Seq[(Long, Long, Long)]): (Option[Long], Option[Long], String) = {
    var cn = 0L; var ck = 0L
    days.sortBy(_._1).foreach { case (d, n, k) =>
      cn += n; ck += k
      val llr = ck.toDouble * la + (cn - ck).toDouble * lb
      if (llr >= ua) return (Some(d), Some(cn), "accept_h1")
      if (llr <= ub) return (Some(d), Some(cn), "accept_h0")
    }
    (None, None, "continue")
  }

  private def run(rows: Seq[(String, Long, Boolean)]) =
    Experiment.sprt(rows.toDF("variant", "day", "conv"),
      "variant", "day", "conv", P0, P1)
      .collect().map(r => r.getAs[String]("variant") -> r).toMap

  test("H1 and H0 crossings land on the brute decision day and n; continue stays open") {
    // hot: p = 0.5 >> p1 -> accept_h1; cold: p = 0 << p0 -> accept_h0;
    // mid: tiny n in the indifference zone -> continue
    val hot = (0L until 6L).flatMap(d =>
      (1 to 10).map(i => ("hot", d, i % 2 == 0)))
    val cold = (0L until 6L).flatMap(d =>
      (1 to 10).map(_ => ("cold", d, false)))
    val mid = Seq(("mid", 0L, true), ("mid", 0L, false), ("mid", 1L, false))
    val out = run(hot ++ cold ++ mid)
    def dayAgg(rows: Seq[(String, Long, Boolean)]) =
      rows.groupBy(_._2).toSeq.map { case (d, rs) =>
        (d, rs.size.toLong, rs.count(_._3).toLong) }
    val (hd, hn, hs) = brute(dayAgg(hot))
    assert(out("hot").getAs[String]("decision") === hs && hs === "accept_h1")
    assert(Option(out("hot").getAs[Long]("decision_day")) === hd)
    assert(out("hot").getAs[Long]("n_at_decision") === hn.get)
    val (cd, cn, cs) = brute(dayAgg(cold))
    assert(out("cold").getAs[String]("decision") === cs && cs === "accept_h0")
    assert(Option(out("cold").getAs[Long]("decision_day")) === cd)
    assert(out("cold").getAs[Long]("n_at_decision") === cn.get)
    val m = out("mid")
    assert(m.getAs[String]("decision") === "continue")
    assert(m.isNullAt(m.fieldIndex("decision_day")) &&
      m.isNullAt(m.fieldIndex("n_at_decision")))
    assert(m.getAs[Long]("n") === 3L && m.getAs[Long]("k") === 1L)
  }

  test("LLR depends on (n, k) only: within-day shuffling changes nothing") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 4L).flatMap(d =>
      (1 to 20).map(_ => ("v", d, rnd.nextInt(3) == 0)))
    val a = run(rows)("v")
    val b = run(rnd.shuffle(rows))("v")
    assert(a.getAs[String]("decision") === b.getAs[String]("decision"))
    assert(a.getAs[Double]("llr_final") === b.getAs[Double]("llr_final"))
    assert(Option(a.getAs[Long]("decision_day")) ===
      Option(b.getAs[Long]("decision_day")))
  }

  test("argument gates fail loud") {
    val e = intercept[IllegalArgumentException] {
      Experiment.sprtConstants(0.4, 0.3, 0.05, 0.05)
    }
    assert(e.getMessage.contains("p0"))
    val e2 = intercept[IllegalArgumentException] {
      Experiment.sprtConstants(0.1, 0.3, 0.5, 0.05)
    }
    assert(e2.getMessage.contains("error rates"))
  }
}
