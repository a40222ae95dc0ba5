package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Trend.olsTrend]] — hand-computed fits, degenerate-key NULL
  * contract, and order-insensitivity of the decimal sufficient sums. */
class TrendSpec extends SparkSpecBase {

  test("olsTrend: exact fit on a perfect line; r2 = 1") {
    val s = spark
    import s.implicits._
    // y = 2x + 5 over x in 10..13
    val df = (10L to 13L).map(x => ("a", x, 2.0 * x + 5.0)).toDF("k", "x", "y")
    val r = Trend.olsTrend(df, Seq("k"), "x", "y").collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 10L)
    assert(r.getDouble(3) === 2.0, "slope")
    assert(r.getDouble(4) === 25.0, "intercept = fitted y at x_min = 2*10+5")
    assert(r.getDouble(5) === 1.0, "r2")
  }

  test("olsTrend: hand-computed non-perfect fit") {
    val s = spark
    import s.implicits._
    // points (0,0),(1,1),(2,1): slope = 0.5, intercept = 1/6, r2 = 0.75
    val df = Seq(("a", 0L, 0.0), ("a", 1L, 1.0), ("a", 2L, 1.0)).toDF("k", "x", "y")
    val r = Trend.olsTrend(df, Seq("k"), "x", "y").collect().head
    assert(r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === 0.166667)
    assert(r.getDouble(5) === 0.75)
  }

  test("olsTrend: degenerate keys are NULL, not NaN/Inf") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("onex", 5L, 1.0), ("onex", 5L, 9.0),   // all x equal
      ("flaty", 1L, 3.0), ("flaty", 2L, 3.0)) // all y equal
      .toDF("k", "x", "y")
    val out = Trend.olsTrend(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(3), r.isNullAt(4), r.isNullAt(5)))).toMap
    assert(out("onex") === ((true, true, true)), "no x variance: all null")
    assert(out("flaty") === ((false, false, true)), "flat y: slope 0, r2 null")
  }

  test("olsTrend: partition-order-insensitive (decimal sums)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 5000).map(i => ("a", i.toLong, math.sin(i) * 100 + i * 0.01))
    val a = Trend.olsTrend(rows.toDF("k", "x", "y").repartition(1), Seq("k"), "x", "y")
      .collect().head.toString
    val b = Trend.olsTrend(rows.reverse.toDF("k", "x", "y").repartition(32), Seq("k"), "x", "y")
      .collect().head.toString
    assert(a === b)
  }

  test("ewmaChart: hand-computed weighted mean, sd, z on a small series") {
    val s = spark
    import s.implicits._
    // priors (newest first): 10, 12, 8, 10 — window 4 weights 8,4,2,1
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 8.0), ("a", 3L, 12.0),
      ("a", 4L, 10.0), ("a", 5L, 20.0)).toDF("k", "t", "v")
    val r = Trend.ewmaChart(df, Seq("k"), "t", "v",
      window = 4, minPriors = 3, valueQuantDecimals = 0).collect().head
    val sw = 8.0 + 4 + 2 + 1
    val ewma = (10 * 8 + 12 * 4 + 8 * 2 + 10 * 1) / sw
    val xs = Seq(10.0, 12, 8, 10)
    val m = xs.sum / 4
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / 3)
    val z = (20.0 - ewma) / (sd * math.sqrt(64.0 + 16 + 4 + 1) / sw)
    assert(r.getAs[Long]("x_ord") === 5L)
    assert(r.getAs[Long]("n_prior") === 4L)
    assert(r.getAs[Double]("x_last") === 20.0)
    assert(math.abs(r.getAs[Double]("ewma") -
      BigDecimal(ewma).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getAs[Double]("sd_prior") -
      BigDecimal(sd).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") -
      BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-4)
    assert(r.getAs[Boolean]("flagged"), "a 2x jump must trip the chart")
  }

  test("ewmaChart: recency weighting catches a ramp the flat mean absorbs") {
    val s = spark
    import s.implicits._
    // slow ramp: last reading continues the recent trend, far from the
    // old level — EWMA centered near recent values gives modest z, while
    // the distance from the WHOLE-window flat mean is larger
    val ramp = (1 to 12).map(i => ("r", i.toLong, if (i <= 8) 100.0 else 100.0 + (i - 8) * 30))
    val r = Trend.ewmaChart(ramp.toDF("k", "t", "v"), Seq("k"), "t", "v",
      window = 8, valueQuantDecimals = 0).collect().head
    // EWMA of priors sits well above the flat-window mean: recent
    // readings dominate
    val priors = (2 to 9).map(j => ramp(12 - j)._3) // newest first
    val flatMean = priors.sum / 8
    assert(r.getAs[Double]("ewma") > flatMean + 10,
      s"ewma ${r.getAs[Double]("ewma")} should exceed flat mean $flatMean")
  }

  test("ewmaChart: constant and fresh series surface NULLs, never NaN") {
    val s = spark
    import s.implicits._
    val df = Seq(("const", 1L, 5.0), ("const", 2L, 5.0), ("const", 3L, 5.0),
      ("const", 4L, 5.0), ("const", 5L, 5.0),
      ("fresh", 1L, 1.0), ("fresh", 2L, 2.0)).toDF("k", "t", "v")
    val out = Trend.ewmaChart(df, Seq("k"), "t", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("const").isNullAt(out("const").fieldIndex("z")),
      "zero variance cannot be z-scored")
    assert(!out("const").isNullAt(out("const").fieldIndex("ewma")))
    assert(out("fresh").isNullAt(out("fresh").fieldIndex("z")),
      "1 prior < minPriors")
  }

  test("ewmaChart: partition-order-insensitive; window bounds enforced") {
    val s = spark
    import s.implicits._
    val rows = (1 to 300).map(i => ("k" + i % 7, i.toLong, math.sin(i) * 50 + 100))
    def run(df: org.apache.spark.sql.DataFrame) =
      Trend.ewmaChart(df, Seq("k"), "t", "v").orderBy("k")
        .collect().map(_.toString).mkString("|")
    assert(run(rows.toDF("k", "t", "v").repartition(1)) ===
      run(rows.reverse.toDF("k", "t", "v").repartition(32)))
    intercept[IllegalArgumentException](
      Trend.ewmaChart(rows.toDF("k", "t", "v"), Seq("k"), "t", "v", window = 26))
    intercept[IllegalArgumentException](
      Trend.ewmaChart(rows.toDF("k", "t", "v"), Seq("k"), "t", "v", minPriors = 1))
  }

  /** Sequential reference of the cusum RECURSION (the textbook
    * max(0, ·) form) under the operator's exact contract: 6-rounded z,
    * BigDecimal accumulation — the window identity must reproduce it. */
  private def refCusum(xs: Seq[Long], refSlots: Int, slack: Double)
      : Seq[(Double, Double, Double)] = {
    val n = refSlots
    val ref = xs.take(n)
    val s = ref.sum.toDouble
    val sq = ref.map(x => x.toDouble * x).sum
    val mu = s / n
    val sd = math.sqrt(math.max((sq - s * s / n) / n, 0.0))
    require(sd > 0, "test fixture must have nonzero reference sd")
    val k = BigDecimal("0.5")
    var sp = BigDecimal(0); var sn = BigDecimal(0)
    xs.map { x =>
      val z = BigDecimal((x - mu) / sd)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      sp = (sp + z - k).max(0)
      sn = (sn - z - k).max(0)
      (z.toDouble, sp.toDouble, sn.toDouble)
    }
  }

  private def engineCusum(xs: Seq[Long], refSlots: Int = 7, parts: Int = 4)
      : Seq[(Double, Double, Double, Boolean, Boolean)] = {
    val s = spark
    import s.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("key", "slot", "x").repartition(parts)
    Trend.cusum(df, "key", "slot", "x", refSlots = refSlots)
      .collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6), r.getBoolean(7)))
  }

  test("cusum: window identity equals the textbook recursion on random series") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val xs = Seq.fill(30)(100L + rnd.nextInt(21))
      val got = engineCusum(xs)
      val want = refCusum(xs, 7, 0.5)
      assert(got.map(t => (t._1, t._2, t._3)) === want, s"trial $trial")
    }
  }

  test("cusum: a planted level shift alarms on the positive side, in-control does not") {
    // reference period ~100, then jump to 115 (~1.5 sd steps accumulate)
    val pre = Seq(98L, 102L, 100L, 97L, 103L, 101L, 99L)
    val shifted = pre ++ Seq.fill(10)(115L)
    val got = engineCusum(shifted)
    assert(got.exists(_._4), "positive alarm expected after the shift")
    assert(!got.exists(_._5), "no negative alarm on an upward shift")
    val calm = pre ++ Seq(100L, 101L, 99L, 102L, 98L)
    assert(!engineCusum(calm).exists(t => t._4 || t._5), "in-control stays silent")
  }

  test("cusum: keys shorter than refSlots or with zero reference sd are dropped") {
    val s = spark
    import s.implicits._
    val df = (Seq.tabulate(5)(i => ("short", i.toLong, 100L + i)) ++
      Seq.tabulate(10)(i => ("flat", i.toLong, 100L)) ++
      Seq.tabulate(10)(i => ("ok", i.toLong, 100L + (i % 3))))
      .toDF("key", "slot", "x")
    val keys = Trend.cusum(df, "key", "slot", "x", refSlots = 7)
      .select("key").distinct().collect().map(_.getString(0)).toSet
    assert(keys === Set("ok"))
  }

  test("cusum is invariant to input partitioning") {
    val rnd = new scala.util.Random(43)
    val xs = Seq.fill(25)(50L + rnd.nextInt(11))
    assert(engineCusum(xs, parts = 1) === engineCusum(xs, parts = 8))
  }

  test("cusum rejects fractional value columns instead of truncating") {
    val s = spark
    import s.implicits._
    // 2.7 would silently truncate to 2 under cast("long") while the
    // streaming twin rounds to 3 — the operator fails loud instead
    val df = Seq(("k", 0L, 2.7)).toDF("key", "slot", "x")
    val e = intercept[IllegalArgumentException] {
      Trend.cusum(df, "key", "slot", "x")
    }
    assert(e.getMessage.contains("must be integral"))
  }
}
