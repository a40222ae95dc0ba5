package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpecBase {

  private def jw(a: String, b: String): Double =
    JaroWinkler.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches the DuckDB/RapidFuzz probe fixtures exactly") {
    // every expected value below was read off DuckDB 1.0's
    // jaro_winkler_similarity on the same inputs (the oracle engine)
    val fixtures = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("duane", "dwayne", 0.8400000000000001),
      ("abcdef", "zabcde", 0.888888888888889),
      ("prefix", "prefly", 0.8666666666666666),
      ("aaapq", "aaxyz", 0.6), // jaro < 0.7: boost suppressed despite prefix
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0), // window 0: no positional match
      ("xyz", "abc", 0.0),
      ("", "", 0.0), // DuckDB contract: empty input scores 0, not 1
      ("a", "", 0.0),
      // multibyte: scored over UTF-8 bytes, same as the oracle
      ("café", "cafe", 0.8483333333333334),
      ("über", "uber", 0.7833333333333333),
      ("日本語", "日本誤", 0.9555555555555556))
    for ((a, b, want) <- fixtures)
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
  }

  test("odd transposition counts floor (DuckDB probe: abcxyz/bcaxyz)") {
    // matched sequences abc vs bca mismatch at 3 positions -> t = 3/2 = 1
    val jaro = (1.0 + 1.0 + 5.0 / 6) / 3
    assert(math.abs(jw("abcxyz", "bcaxyz") - jaro) < 1e-12)
  }

  test("symmetry and range over random pairs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val x = jw(a, b)
      assert(math.abs(x - jw(b, a)) < 1e-12)
      assert(x >= 0.0 && x <= 1.0)
      if (a == b && a.nonEmpty) assert(x == 1.0)
    }
  }

  test("codegen path agrees with interpreted eval in a DataFrame") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.graftglue.ColumnGlue
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("café", "cafe"), (null, "x"))
      .toDF("a", "b")
    val out = df.select(ColumnGlue.column(JaroWinkler(
        ColumnGlue.expression(col("a")), ColumnGlue.expression(col("b"))))
        .as("s"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - 0.8133333333333332) < 1e-12)
    assert(out(2).getDouble(0) == 0.0)
    assert(math.abs(out(3).getDouble(0) - 0.8483333333333334) < 1e-12)
    assert(out(4).isNullAt(0)) // null-propagating like every binary scalar
  }

  test("non-string input is rejected with a clear message") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.graftglue.ColumnGlue
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(ColumnGlue.column(JaroWinkler(
          ColumnGlue.expression(col("a")), ColumnGlue.expression(col("b")))))
        .collect()
    }
    assert(ex.getMessage.contains("jaro_winkler") ||
      ex.getMessage.contains("string"))
  }
}
