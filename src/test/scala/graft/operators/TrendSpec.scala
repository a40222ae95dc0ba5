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
}
