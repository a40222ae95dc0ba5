package graft.operators

import graft.SparkSpecBase

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
