package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Linkage.fellegiSunter]] — weight arithmetic (driver-computed plan
  * literals), the null-counts-as-disagreement convention, decision
  * bands, and parameter validation. */
class LinkageSpec extends SparkSpecBase {

  private val rules = Seq(
    Linkage.FieldRule("a", col("xa") === col("ya"), 0.9, 0.1),   // +3.169925 / -3.169925
    Linkage.FieldRule("b", col("xb") === col("yb"), 0.8, 0.2))   // +2.0 / -2.0

  test("weights: log2(m/u) rounded to 6 on the driver; symmetric example") {
    assert(rules(0).agreeWeight === 3.169925 && rules(0).disagreeWeight === -3.169925)
    assert(rules(1).agreeWeight === 2.0 && rules(1).disagreeWeight === -2.0)
  }

  test("score = fixed-order literal sum; decision bands; null field disagrees") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      ("p1", "x", "x", "u", "u"),     // both agree: 5.169925
      ("p2", "x", "x", "u", "v"),     // a only: 1.169925
      ("p3", "x", "y", "u", "v"),     // none: -5.169925
      ("p4", null, "x", "u", "u"))    // null a -> disagree: -1.169925
      .toDF("id", "xa", "ya", "xb", "yb")
    val out = Linkage.fellegiSunter(pairs, rules, upper = 5.0, lower = 0.0)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getDouble(7), r.getString(8)))).toMap
    assert(out("p1") === ((true, true, 5.169925, "match")))
    assert(out("p2") === ((true, false, 1.169925, "possible")))
    assert(out("p3") === ((false, false, -5.169925, "nonmatch")))
    assert(out("p4") === ((false, true, -1.169925, "nonmatch")))
  }

  test("parameter validation: m must exceed u, probabilities strict") {
    intercept[IllegalArgumentException] {
      Linkage.FieldRule("bad", lit(true), 0.1, 0.9)
    }
    intercept[IllegalArgumentException] {
      Linkage.FieldRule("bad", lit(true), 1.0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(spark.range(1).toDF(), rules, upper = 0.0, lower = 1.0)
    }
  }
}
