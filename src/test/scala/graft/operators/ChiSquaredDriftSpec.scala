package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** Two-sample chi-squared homogeneity contracts: the textbook 2×3
  * value, the Wilson–Hilferty normalization, the null behavior on a
  * homogeneous mix, guards, and partition invariance. */
class ChiSquaredDriftSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def table(counts: Seq[(String, Int, Int)]) =
    counts.flatMap { case (cat, a, b) =>
      Seq.fill(a)((cat, true)) ++ Seq.fill(b)((cat, false))
    }.toDF("cat", "side")

  test("textbook 2x3 table: chi2 = 20, dof = 2, Wilson-Hilferty z, drifted") {
    // sides (10,20,30) vs (30,20,10): exp all 20, chi2 = 4*(100/20) = 20
    val df = table(Seq(("a", 10, 30), ("b", 20, 20), ("c", 30, 10)))
    val out = Quality.chiSquaredDrift(df, "cat", "side").collect().head
    assert(out.getAs[Long]("n1") === 60L && out.getAs[Long]("n2") === 60L)
    assert(out.getAs[Long]("categories") === 3L)
    assert(math.abs(out.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(out.getAs[Long]("dof") === 2L)
    val z = (math.cbrt(10.0) - (1.0 - 2.0 / 18.0)) / math.sqrt(2.0 / 18.0)
    assert(math.abs(out.getAs[Double]("z_wh") - z) < 1e-6)
    assert(out.getAs[Boolean]("drifted"))
  }

  test("homogeneous mix: chi2 = 0, z negative, not drifted; partition invariance") {
    val df = table(Seq(("a", 12, 24), ("b", 30, 60), ("c", 6, 12)))
    val out = Quality.chiSquaredDrift(df, "cat", "side").collect().head
    assert(out.getAs[Double]("chi2") === 0.0)
    assert(out.getAs[Double]("z_wh") < 0.0)
    assert(!out.getAs[Boolean]("drifted"))
    val re = Quality.chiSquaredDrift(df.repartition(7), "cat", "side")
      .collect().head
    assert(re.getAs[Double]("chi2") === out.getAs[Double]("chi2") &&
      re.getAs[Double]("z_wh") === out.getAs[Double]("z_wh"),
      "decimal term accumulation must be partition-order-insensitive")
  }

  test("chiSquaredResiduals: textbook-formula equality, shares sum to 1, Cramer's V") {
    // brute reference: r = (obs - exp)/sqrt(exp (1 - n1/N)(1 - t/N)) must
    // equal the exact-integer reduction to ~1e-9 on an irregular table
    val counts = Seq(("a", 7, 19), ("b", 31, 11), ("c", 13, 13), ("d", 2, 40))
    val df = table(counts)
    val got = Quality.chiSquaredResiduals(df, "cat", "side").collect()
      .map(r => r.getAs[String]("cat") -> r).toMap
    val n1 = counts.map(_._2).sum.toDouble
    val n2 = counts.map(_._3).sum.toDouble
    val nTot = n1 + n2
    var chi2 = 0.0
    counts.foreach { case (cat, aI, bI) =>
      val (a, b) = (aI.toDouble, bI.toDouble)
      val t = a + b
      val e1 = n1 * t / nTot; val e2 = n2 * t / nTot
      chi2 += (a - e1) * (a - e1) / e1 + (b - e2) * (b - e2) / e2
      val want = (a - e1) / math.sqrt(e1 * (1.0 - n1 / nTot) * (1.0 - t / nTot))
      val row = got(cat)
      assert(math.abs(row.getAs[Double]("adj_residual") - want) < 1e-6,
        s"category $cat adjusted residual")
      assert(row.getAs[Boolean]("moved") === (math.abs(want) > 1.959963984540054))
    }
    val shares = got.values.map(_.getAs[Double]("chi2_share")).sum
    assert(math.abs(shares - 1.0) < 1e-5, "chi2 shares sum to 1")
    val v = math.sqrt(chi2 / nTot)
    got.values.foreach(r =>
      assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-6))
    // partition invariance (decimal share accumulation)
    val re = Quality.chiSquaredResiduals(df.repartition(9), "cat", "side")
      .collect().map(r => r.getAs[String]("cat") -> r).toMap
    counts.foreach { case (cat, _, _) =>
      assert(re(cat).getAs[Double]("adj_residual") ===
        got(cat).getAs[Double]("adj_residual"))
      assert(re(cat).getAs[Double]("chi2_share") ===
        got(cat).getAs[Double]("chi2_share"))
    }
  }

  test("chiSquaredResiduals: homogeneous zeros, share NULL at tsum 0, guards") {
    val homo = Quality.chiSquaredResiduals(
      table(Seq(("a", 12, 24), ("b", 30, 60))), "cat", "side").collect()
    homo.foreach { r =>
      assert(r.getAs[Long]("d") === 0L)
      assert(r.getAs[Double]("adj_residual") === 0.0)
      assert(!r.getAs[Boolean]("moved"))
      assert(r.isNullAt(r.fieldIndex("chi2_share")),
        "no drift signal to apportion at tsum = 0")
      assert(r.getAs[Double]("cramers_v") === 0.0)
    }
    val oneCat = Quality.chiSquaredResiduals(
      table(Seq(("only", 9, 14))), "cat", "side").collect().head
    assert(oneCat.getAs[Long]("c1") === 9L && oneCat.getAs[Long]("c2") === 14L)
    assert(oneCat.isNullAt(oneCat.fieldIndex("adj_residual")) &&
      oneCat.isNullAt(oneCat.fieldIndex("cramers_v")))
    val oneSide = Quality.chiSquaredResiduals(
      table(Seq(("a", 5, 0), ("b", 3, 0))), "cat", "side").collect()
    oneSide.foreach(r => assert(r.isNullAt(r.fieldIndex("adj_residual"))))
  }

  test("jensenShannonDrift: identical mixes 0, disjoint ln2, brute reference, zero cells finite") {
    // identical mixes: jsd exactly 0, distance 0
    val same = Quality.jensenShannonDrift(
      table(Seq(("a", 12, 24), ("b", 30, 60), ("c", 6, 12))), "cat", "side")
      .collect().head
    assert(same.getAs[Double]("jsd") === 0.0 &&
      same.getAs[Double]("js_dist") === 0.0)
    // fully disjoint supports: jsd = ln 2, normalized 1, distance 1
    val disj = Quality.jensenShannonDrift(
      table(Seq(("a", 10, 0), ("b", 0, 25))), "cat", "side").collect().head
    assert(math.abs(disj.getAs[Double]("jsd") - math.log(2.0)) < 1e-6,
      "output is 6-dp rounded; ln 2 to 6 dp")
    assert(disj.getAs[Double]("jsd_norm") === 1.0 &&
      disj.getAs[Double]("js_dist") === 1.0)
    // brute reference on an irregular table with a one-sided category
    val counts = Seq(("a", 7, 19), ("b", 31, 11), ("c", 0, 13), ("d", 2, 40))
    val got = Quality.jensenShannonDrift(table(counts), "cat", "side")
      .collect().head
    val n1 = counts.map(_._2).sum.toDouble
    val n2 = counts.map(_._3).sum.toDouble
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val ref = counts.map { case (_, aI, bI) =>
      val p = aI / n1; val q = bI / n2
      val h1 = if (aI > 0) 0.5 * p * math.log(2.0 * p / (p + q)) else 0.0
      val h2 = if (bI > 0) 0.5 * q * math.log(2.0 * q / (p + q)) else 0.0
      dec12(h1 + h2)
    }.sum.toDouble
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("jsd") === r6(ref))
    assert(got.getAs[Double]("js_dist") ===
      r6(math.sqrt(ref / 0.6931471805599453)))
    assert(got.getAs[Long]("categories") === 4L)
    // bounded: 0 <= jsd_norm <= 1 even with the zero cell
    assert(got.getAs[Double]("jsd_norm") >= 0.0 &&
      got.getAs[Double]("jsd_norm") <= 1.0)
    // partition invariance; empty-side guard
    val re = Quality.jensenShannonDrift(
      table(counts).repartition(9), "cat", "side").collect().head
    assert(re.getAs[Double]("jsd") === got.getAs[Double]("jsd"))
    val oneSide = Quality.jensenShannonDrift(
      table(Seq(("a", 5, 0), ("b", 3, 0))), "cat", "side").collect().head
    assert(oneSide.getAs[Long]("n2") === 0L &&
      oneSide.isNullAt(oneSide.fieldIndex("jsd")) &&
      oneSide.isNullAt(oneSide.fieldIndex("js_dist")))
  }

  test("cmhTest: Simpson pair scores exactly null; hand 2x2; OR; guards") {
    def tbl(rows: Seq[(String, Boolean, Boolean, Int)]) =
      rows.flatMap { case (k, e, o, c) => Seq.fill(c)((k, e, o)) }
        .toDF("k", "e", "o")
    // two strata with within-stratum OR = 1 but a STRONG marginal
    // association (Simpson's construction): CMH must score exactly 0
    val simpson = tbl(Seq(
      ("A", true, true, 80), ("A", true, false, 20),
      ("A", false, true, 8), ("A", false, false, 2),
      ("B", true, true, 2), ("B", true, false, 8),
      ("B", false, true, 20), ("B", false, false, 80)))
    val gs = Quality.cmhTest(simpson, "k", "e", "o").collect().head
    assert(gs.getAs[Double]("o_minus_e") === 0.0)
    assert(gs.getAs[Double]("z") === 0.0 && !gs.getAs[Boolean]("significant"))
    assert(gs.getAs[Double]("or_mh") === 1.0 &&
      gs.getAs[Double]("log_or") === 0.0)
    // ...while the MARGINAL 2x2 on the same rows is wildly significant
    val marginal = Quality.chiSquaredDrift(
      simpson.select(col("o").cast("string").as("cat"), col("e").as("side")),
      "cat", "side").collect().head
    assert(marginal.getAs[Boolean]("drifted"),
      "the marginal test must be fooled for the pin to mean anything")
    // hand-computed single-stratum 2x2: a=30 b=10 c=10 d=30
    val hand = tbl(Seq(("s", true, true, 30), ("s", true, false, 10),
      ("s", false, true, 10), ("s", false, false, 30)))
    val gh = Quality.cmhTest(hand, "k", "e", "o").collect().head
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val oe = dec12((30.0 * 80 - 40.0 * 40) / 80.0).toDouble
    val v = dec12((40.0 * 40 / 80.0) * (40.0 / 80.0) * (40.0 / 79.0)).toDouble
    assert(gh.getAs[Double]("o_minus_e") === r6(oe))
    assert(gh.getAs[Double]("var_cmh") === r6(v))
    assert(gh.getAs[Double]("z") === r6(oe / math.sqrt(v)))
    assert(gh.getAs[Boolean]("significant"))
    assert(gh.getAs[Double]("or_mh") === 9.0)
    // zero margin: no unexposed-positive anywhere -> OR NULL, z live
    val zm = Quality.cmhTest(tbl(Seq(("s", true, true, 10),
      ("s", true, false, 5), ("s", false, false, 15))), "k", "e", "o")
      .collect().head
    assert(zm.isNullAt(zm.fieldIndex("or_mh")) &&
      !zm.isNullAt(zm.fieldIndex("z")))
    // fully degenerate (one row per stratum): V = 0 -> test NULLs
    val dg = Quality.cmhTest(tbl(Seq(("x", true, true, 1),
      ("y", false, false, 1))), "k", "e", "o").collect().head
    assert(dg.isNullAt(dg.fieldIndex("z")) &&
      dg.isNullAt(dg.fieldIndex("significant")))
    // partition invariance
    val gp = Quality.cmhTest(simpson.repartition(9), "k", "e", "o")
      .collect().head
    assert(gp.getAs[Double]("o_minus_e") === gs.getAs[Double]("o_minus_e") &&
      gp.getAs[Double]("var_cmh") === gs.getAs[Double]("var_cmh"))
  }

  test("guards: empty side and single category NULL out; nulls filtered") {
    val oneSide = table(Seq(("a", 5, 0), ("b", 3, 0)))
    val o = Quality.chiSquaredDrift(oneSide, "cat", "side").collect().head
    assert(o.getAs[Long]("n2") === 0L && o.isNullAt(o.fieldIndex("chi2")) &&
      o.isNullAt(o.fieldIndex("drifted")))
    val oneCat = table(Seq(("only", 9, 14)))
    val c = Quality.chiSquaredDrift(oneCat, "cat", "side").collect().head
    assert(c.getAs[Long]("categories") === 1L &&
      c.isNullAt(c.fieldIndex("chi2")) && c.isNullAt(c.fieldIndex("z_wh")))
    val withNulls = Seq(("a", Some(true)), ("a", None), (null, Some(false)),
      ("b", Some(false)), ("a", Some(false)), ("b", Some(true)))
      .toDF("cat", "side")
    val w = Quality.chiSquaredDrift(withNulls, "cat", "side").collect().head
    assert(w.getAs[Long]("n1") === 2L && w.getAs[Long]("n2") === 2L)
  }
}
