package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Experiment.cuped]] gates: equality with a sequential reference
  * under the exact quantize/fixed-order contract, genuine variance
  * reduction on correlated data, the zero-variance-covariate pin, and
  * partition invariance. */
class ExperimentSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  /** Sequential reference replicating the operator's contract exactly:
    * ×10^q quantization, exact integer sums, fixed-order doubles. */
  private def refCuped(rows: Seq[(String, Double, Double)], q: Int = 4)
      : Map[String, (Long, Double, Double, Double, Double, Double, Double)] = {
    val ys = math.pow(10.0, q)
    val qr = rows.map { case (v, x, y) =>
      (v, math.round(x * ys), math.round(y * ys)) }
    def sums(rs: Seq[(String, Long, Long)]) = {
      val n = rs.size.toDouble
      val sx = rs.map(r => BigInt(r._2)).sum.toDouble
      val sy = rs.map(r => BigInt(r._3)).sum.toDouble
      val sxx = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
      val syy = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble
      val sxy = rs.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble
      (n, sx, sy, sxx, syy, sxy)
    }
    val (np, sxp, syp, sxxp, _, sxyp) = sums(qr)
    val varXp = (sxxp - sxp * sxp / np) / (np - 1.0)
    val covP = (sxyp - sxp * syp / np) / (np - 1.0)
    val theta = if (varXp > 0.0) covP / varXp else 0.0
    val xbar = sxp / np
    def rnd(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    qr.groupBy(_._1).map { case (v, rs) =>
      val (n, sx, sy, sxx, syy, sxy) = sums(rs)
      val varY = (syy - sy * sy / n) / (n - 1.0)
      val varX = (sxx - sx * sx / n) / (n - 1.0)
      val covXY = (sxy - sx * sy / n) / (n - 1.0)
      val varAdj = varY - 2.0 * theta * covXY + theta * theta * varX
      v -> ((n.toLong, rnd(sy / n / ys),
        rnd((sy / n - theta * (sx / n - xbar)) / ys),
        rnd(varY / ys / ys), rnd(varAdj / ys / ys),
        rnd(1.0 - varAdj / varY), rnd(theta)))
    }
  }

  private def engineCuped(rows: Seq[(String, Double, Double)], parts: Int = 4)
      : Map[String, (Long, Double, Double, Double, Double, Double, Double)] =
    Experiment.cuped(rows.toDF("variant", "x", "y").repartition(parts))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap

  private def correlated(seed: Long, n: Int): Seq[(String, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val v = if (i % 2 == 0) "treat" else "ctrl"
      val x = 10.0 + rnd.nextGaussian() * 3.0
      val lift = if (v == "treat") 0.5 else 0.0
      // y strongly driven by the unit's pre-period level
      val y = x * 0.8 + lift + rnd.nextGaussian() * 1.0
      (v, math.rint(x * 100) / 100, math.rint(y * 100) / 100)
    }
  }

  test("cuped equals the sequential reference on randomized correlated data") {
    for (seed <- Seq(3L, 19L)) {
      val rows = correlated(seed, 200)
      assert(engineCuped(rows) === refCuped(rows), s"seed=$seed")
    }
  }

  test("cuped genuinely reduces variance on autocorrelated metrics") {
    val got = engineCuped(correlated(7L, 400))
    got.values.foreach { case (_, _, _, varY, varAdj, red, theta) =>
      assert(varAdj < varY, "adjusted variance must shrink")
      assert(red > 0.3, s"expected a strong reduction, got $red")
      assert(theta > 0.5, "theta should track the planted x->y slope")
    }
  }

  test("cuped: constant covariate pins theta to 0 and passes raw means through") {
    val rows = Seq(("a", 5.0, 1.0), ("a", 5.0, 3.0), ("b", 5.0, 2.0), ("b", 5.0, 6.0))
    val got = engineCuped(rows)
    got.values.foreach { case (_, meanY, meanAdj, varY, varAdj, red, theta) =>
      assert(theta === 0.0)
      assert(meanAdj === meanY)
      assert(varAdj === varY)
      assert(red === 0.0)
    }
  }

  test("cuped is invariant to input partitioning") {
    val rows = correlated(11L, 150)
    assert(engineCuped(rows, parts = 1) === engineCuped(rows, parts = 8))
  }

  test("cuped: degenerate variants fail soft with NULLs, never NaN") {
    // variant "solo" has a single unit: no sample variance exists ->
    // var_y / var_y_cuped / var_reduction NULL; means still real
    val rows = Seq(("solo", 4.0, 9.0),
      ("pair", 1.0, 5.0), ("pair", 3.0, 5.0))
    val got = Experiment.cuped(rows.toDF("variant", "x", "y")).collect()
      .map(r => r.getString(0) -> r).toMap
    val solo = got("solo")
    assert(solo.getLong(1) === 1L)
    assert(!solo.isNullAt(2) && !solo.isNullAt(3), "means survive n=1")
    assert(solo.isNullAt(4) && solo.isNullAt(5) && solo.isNullAt(6),
      "variance columns must be NULL, not NaN, for a 1-unit variant")
    // variant "pair" has constant y (var_y = 0): the reduction ratio is
    // undefined -> NULL; var_y itself is a real 0
    val pair = got("pair")
    assert(pair.getDouble(4) === 0.0, "var_y is exactly 0")
    assert(pair.isNullAt(6), "var_reduction NULL when var_y = 0")
    // nothing anywhere is NaN
    got.values.foreach { r =>
      (2 until 8).foreach { i =>
        assert(r.isNullAt(i) || !r.getDouble(i).isNaN, s"NaN at col $i") }
    }
  }

  test("cuped: a 1-row input pins theta to 0 instead of NaN") {
    val got = Experiment.cuped(Seq(("only", 2.0, 7.0)).toDF("variant", "x", "y"))
      .collect()
    assert(got.length === 1)
    assert(got(0).getDouble(7) === 0.0, "pooled np=1 -> theta pinned to 0")
    assert(got(0).getDouble(3) === got(0).getDouble(2),
      "theta=0 -> adjusted mean equals the raw mean")
  }

  test("hodgesLehmann: planted shift exact, sequential reference, invariances, guards") {
    // control values with an outlier; treat = control + 7 exactly:
    // every pairwise difference within matched ranks centers on 7 and
    // the weighted median is EXACTLY 7 (integer, no rounding)
    val ctrl = Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L, 11L, 400L)
    val rows = ctrl.map((_, false)) ++ ctrl.map(v => (v + 7L, true))
    val got = Experiment.hodgesLehmann(rows.toDF("v", "g"), "v", "g")
      .collect().head
    assert(got.getAs[Long]("shift") === 7L)
    assert(got.getAs[Long]("n_pairs") === 100L)
    assert(got.getAs[Long]("ci_lo") <= 7L && 7L <= got.getAs[Long]("ci_hi"))
    // sequential reference on irregular weighted data
    val rnd = new scala.util.Random(71)
    val rows2 = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextBoolean()))
    def ref(data: Seq[(Long, Boolean)]): (Long, Option[Long], Option[Long]) = {
      val t = data.filter(_._2).map(_._1); val c = data.filter(!_._2).map(_._1)
      val ds = (for (a <- t; b <- c) yield a - b).sorted
      val w = ds.size.toLong
      val med = ds(((w + 1) / 2).toInt - 1)
      val klo = math.floor(w.toDouble / 2.0 - 1.959963984540054 *
        math.sqrt(w.toDouble * (t.size + c.size + 1).toDouble / 12.0)).toLong
      if (klo >= 1)
        (med, Some(ds(klo.toInt - 1)), Some(ds((w + 1 - klo).toInt - 1)))
      else (med, None, None)
    }
    val (medR, loR, hiR) = ref(rows2)
    val g2 = Experiment.hodgesLehmann(rows2.toDF("v", "g"), "v", "g")
      .collect().head
    assert(g2.getAs[Long]("shift") === medR)
    assert(Option(g2.getAs[java.lang.Long]("ci_lo")).map(_.toLong) === loR)
    assert(Option(g2.getAs[java.lang.Long]("ci_hi")).map(_.toLong) === hiR)
    // level-shift invariance: +1000 on BOTH arms changes nothing
    val g3 = Experiment.hodgesLehmann(
      rows2.map { case (v, g) => (v + 1000L, g) }.toDF("v", "g"), "v", "g")
      .collect().head
    assert(g3.getAs[Long]("shift") === medR)
    // partition invariance
    val g4 = Experiment.hodgesLehmann(
      rows2.reverse.toDF("v", "g").repartition(7), "v", "g").collect().head
    assert(g4.getAs[Long]("shift") === medR &&
      Option(g4.getAs[java.lang.Long]("ci_lo")).map(_.toLong) === loR)
    // tiny sample: klo < 1 -> CI NULL, shift still exact
    val tiny = Experiment.hodgesLehmann(
      Seq((5L, true), (1L, false), (2L, false)).toDF("v", "g"), "v", "g")
      .collect().head
    // differences {3, 4}: the LOWER median convention picks 3
    assert(tiny.getAs[Long]("shift") === 3L)
    assert(tiny.isNullAt(tiny.fieldIndex("ci_lo")) &&
      tiny.isNullAt(tiny.fieldIndex("ci_hi")))
    // empty arm: shift NULL, counts live
    val solo = Experiment.hodgesLehmann(
      Seq((5L, true), (6L, true)).toDF("v", "g"), "v", "g").collect().head
    assert(solo.getAs[Long]("n_ctrl") === 0L &&
      solo.isNullAt(solo.fieldIndex("shift")))
    intercept[IllegalArgumentException](Experiment.hodgesLehmann(
      Seq((1.0, true)).toDF("v", "g"), "v", "g"))
  }

  test("msprt: sequential reference, planted shift decides, null stays undecided, monotone p, guards") {
    val rnd = new scala.util.Random(53)
    def ref(rows: Seq[(Long, Boolean, Long)], tau2: Double)
        : (Seq[Double], Option[Long]) = {
      val byDay = rows.groupBy(_._1).toSeq.sortBy(_._1)
      var (cnt, cnc, cst, csc, cqt, cqc) = (0L, 0L, 0L, 0L, 0L, 0L)
      var pmin = 1.0
      var dec: Option[Long] = None
      val ps = byDay.map { case (day, g) =>
        val t = g.filter(_._2); val c = g.filter(!_._2)
        cnt += t.size; cnc += c.size
        cst += t.map(_._3).sum; csc += c.map(_._3).sum
        cqt += t.map(x => x._3 * x._3).sum; cqc += c.map(x => x._3 * x._3).sum
        val pDay = if (cnt >= 2 && cnc >= 2) {
          val delta = cst.toDouble / cnt - csc.toDouble / cnc
          val vn = (cqt.toDouble - cst.toDouble * cst.toDouble / cnt) /
            (cnt - 1.0) / cnt +
            (cqc.toDouble - csc.toDouble * csc.toDouble / cnc) /
            (cnc - 1.0) / cnc
          if (vn > 0)
            math.min(1.0, 1.0 / (math.sqrt(vn / (vn + tau2)) *
              math.exp(delta * delta * tau2 / (2.0 * vn * (vn + tau2)))))
          else 1.0
        } else 1.0
        pmin = math.min(pmin, pDay)
        if (dec.isEmpty && pmin * 20 <= 1) dec = Some(day)
        pmin
      }
      (ps, dec)
    }
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sp = spark; import sp.implicits._
    // planted +40 shift on noise sd ~6, tau2 = 100: decides fast
    val planted = for (day <- 0L to 9L; i <- 1 to 12) yield
      (day, i % 2 == 0, (50 + rnd.nextInt(12) + (if (i % 2 == 0) 40 else 0)).toLong)
    val gp = Experiment.msprt(planted.toDF("day", "g", "x"),
      "day", "g", "x", tau2 = 100.0).collect().head
    val (psP, decP) = ref(planted, 100.0)
    assert(gp.getAs[Boolean]("decided") && decP.isDefined)
    assert(gp.getAs[Long]("decision_day") === decP.get)
    assert(gp.getAs[Double]("p_always_valid") === r6(psP.last))
    assert(gp.getAs[Double]("p_at_decision") ===
      r6(psP((decP.get).toInt)))
    // exchangeable null: same values both arms -> p stays 1-ish, undecided
    val nul = for (day <- 0L to 9L; i <- 1 to 12) yield
      (day, i % 2 == 0, (50 + ((day * 31 + i) % 13)).toLong)
    val gn = Experiment.msprt(nul.toDF("day", "g", "x"),
      "day", "g", "x", tau2 = 100.0).collect().head
    val (psN, decN) = ref(nul, 100.0)
    assert(!gn.getAs[Boolean]("decided") && decN.isEmpty)
    assert(gn.isNullAt(gn.fieldIndex("decision_day")))
    assert(gn.getAs[Double]("p_always_valid") === r6(psN.last))
    // monotone: the always-valid p never increases (reference check)
    assert(psN.zip(psN.tail).forall { case (a, b) => b <= a })
    // partition invariance
    val gp2 = Experiment.msprt(
      planted.reverse.toDF("day", "g", "x").repartition(7),
      "day", "g", "x", tau2 = 100.0).collect().head
    assert(gp2.getAs[Double]("p_always_valid") ===
      gp.getAs[Double]("p_always_valid") &&
      gp2.getAs[Long]("decision_day") === gp.getAs[Long]("decision_day"))
    // guards
    intercept[IllegalArgumentException](Experiment.msprt(
      planted.toDF("day", "g", "x"), "day", "g", "x", tau2 = 0.0))
    intercept[IllegalArgumentException](Experiment.msprt(
      Seq((1L, true, 1.0)).toDF("day", "g", "x"), "day", "g", "x",
      tau2 = 1.0))
    // one-arm data: never decides, p = 1
    val solo = Experiment.msprt(
      Seq((1L, true, 5L), (2L, true, 6L)).toDF("day", "g", "x"),
      "day", "g", "x", tau2 = 1.0).collect().head
    assert(!solo.getAs[Boolean]("decided") &&
      solo.getAs[Double]("p_always_valid") === 1.0)
  }
}
