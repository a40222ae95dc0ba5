package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Profile/check contracts on a hand-built table with known nulls,
  * duplicates, and bounds — the measurements are exact count arithmetic,
  * so every expectation is an equality. */
class ProfileSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def fixture = Seq(
    (1L, Some("en"), 10L),
    (2L, Some("en"), 20L),
    (3L, None, 30L),
    (4L, Some("de"), 20L),
    (5L, Some("fr"), 50L)
  ).toDF("id", "lang", "n")

  test("profile: completeness, distinct, bounds exact on a known table") {
    val p = Profile.profile(fixture, Seq("id", "lang", "n")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "lang", "n"))
    p.values.foreach(r => assert(r.getLong(1) === 5L)) // n_rows everywhere
    val lang = p("lang")
    assert(lang.getLong(2) === 4L)                     // n_nonnull
    assert(lang.getDouble(3) === 0.8)                  // completeness
    assert(lang.getLong(4) === 3L)                     // distinct: en, de, fr
    assert(lang.getString(5) === "de" && lang.getString(6) === "fr")
    val id = p("id")
    assert(id.getLong(2) === 5L && id.getLong(4) === 5L)
    assert(id.getString(5) === "1" && id.getString(6) === "5")
    assert(p("n").getLong(4) === 4L)                   // 10,20,30,50
  }

  test("check: verdicts over one shared pass; pass and fail both observed") {
    val verdicts = Profile.check(fixture, Seq(
        Profile.Unique("id"),
        Profile.Unique("n"),                    // fails: 20 duplicated
        Profile.Complete("lang", atLeast = 0.9), // fails: 0.8
        Profile.Complete("lang", atLeast = 0.5),
        Profile.DistinctBetween("lang", 2, 5)))
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(verdicts("unique(id)") === true)
    assert(verdicts("unique(n)") === false)
    assert(verdicts("completeness(lang) >= 0.9") === false)
    assert(verdicts("completeness(lang) >= 0.5") === true)
    assert(verdicts("n_distinct(lang) in [2, 5]") === true)
  }

  test("topValues: per-column heavy hitters with deterministic tie-break; nulls excluded") {
    val df = Seq(
      (Some("en"), "web"), (Some("en"), "web"), (Some("en"), "books"),
      (Some("de"), "web"), (Some("de"), "news"), (None, "news")
    ).toDF("lang", "source")
    val top = Profile.topValues(df, Seq("lang", "source"), k = 2).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(top(("lang", 1L)) === (("en", 3L)))
    assert(top(("lang", 2L)) === (("de", 2L)))   // null lang never ranks
    assert(top(("source", 1L)) === (("web", 3L)))
    assert(top(("source", 2L)) === (("news", 2L))) // null-lang row still counts here
    assert(top.size === 4)
  }

  test("diff: null influx moves completeness_delta; row loss moves the ratio; empty side yields NULL ratio") {
    val before = Seq(
      (1L, Some("en")), (2L, Some("en")), (3L, Some("de")), (4L, Some("fr"))
    ).toDF("id", "lang")
    val after = Seq(
      (1L, Some("en")), (2L, None: Option[String]), (3L, None: Option[String])
    ).toDF("id", "lang")
    val d = Profile.diff(before, after, Seq("id", "lang")).collect()
      .map(r => r.getString(0) -> r).toMap
    val lang = d("lang")
    assert(lang.getDouble(3) === 0.75)                 // n_rows 4 -> 3
    assert(lang.getDouble(4) === 1.0 && lang.getDouble(5) === 0.3333)
    assert(lang.getDouble(6) === -0.6667)              // the null-influx alarm
    assert(lang.getLong(7) === 3L && lang.getLong(8) === 1L)
    assert(lang.getDouble(9) === 0.3333)               // enum collapse
    assert(d("id").getDouble(6) === 0.0, "key column unchanged in completeness")
  }

  test("approxDistinct profile still returns one row per column with sane cardinality") {
    val p = Profile.profile(fixture, Seq("id", "lang"), approxDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // HLL at this size is exact in practice; allow slack anyway
    assert(math.abs(p("id") - 5L) <= 1L)
    assert(math.abs(p("lang") - 3L) <= 1L)
  }

  test("referentialIntegrity: orphans counted, NULL keys are absent not dangling") {
    val s = spark; import s.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.referentialIntegrity(child, parent, "fk", "pk", "c->p")
      .collect().head
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 6L, "child rows incl. the NULL")
    assert(r.getLong(2) === 1L, "one NULL key, counted apart")
    assert(r.getLong(3) === 3L, "distinct non-null keys")
    assert(r.getLong(4) === 2L && r.getLong(5) === 1L,
      "two orphan rows, one orphan key (9)")
    assert(r.getDouble(6) === 0.4, "orphan share over NON-NULL keys: 2/5")
    assert(!r.getBoolean(7))
    val ok = Profile.referentialIntegrity(
      parent.withColumnRenamed("pk", "fk"), parent, "fk", "pk", "ok")
      .collect().head
    assert(ok.getBoolean(7) && ok.getLong(4) === 0L)
  }

  test("jsonKeyLifecycle: lifecycle verdicts, malformed JSON contributes nothing") {
    val s = spark; import s.implicits._
    def d(s0: String) = java.sql.Date.valueOf(s0)
    val rows = Seq(
      (d("2024-01-01"), """{"k": 1, "old": 2}"""),
      (d("2024-01-02"), """{"k": 1}"""),
      (d("2024-01-03"), """{"k": 1, "new": 3}"""),
      (d("2024-01-03"), "not json at all"),
      (d("2024-01-03"), null.asInstanceOf[String])
    ).toDF("day", "props")
    val got = Profile.jsonKeyLifecycle(rows, col("day"), col("props"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getDouble(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(got.keySet === Set("k", "old", "new"),
      "malformed and NULL payloads contribute no keys")
    assert(got("k") === ((3L, 3L, 1.0, false, false)), "persistent key")
    assert(got("old") === ((1L, 1L, round4p(1.0 / 3), false, true)), "vanished")
    assert(got("new") === ((1L, 1L, round4p(1.0 / 3), true, false)), "appeared")
  }

  private def round4p(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("concentration: hand-computed Gini on known distributions") {
    val s = spark; import s.implicits._
    def gini(rows: Seq[(String, Long)]): (Long, Long, Double, Double, Double) = {
      val r = Profile.concentration(rows.toDF("k", "w"), "k", col("w"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    // flat distribution: G = 0; top1 = 1/4; top decile = ceil(4/10)=1 group
    assert(gini(Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))) ===
      ((4L, 40L, 0.0, 0.25, 0.25)))
    // total concentration in 1 of 4 groups: G = (n-1)/n − small; exact:
    // x = (0,0,0,40): Σi·x = 4·40; G = 2·160/(4·40) − 5/4 = 2 − 1.25
    assert(gini(Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 40L))) ===
      ((4L, 40L, 0.75, 1.0, 1.0)))
    // hand case: x asc = (1,2,3,4): G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    assert(gini(Seq(("a", 4L), ("b", 3L), ("c", 2L), ("d", 1L)))._3 === 0.25)
    // 20 equal groups: top decile = 2 groups = 0.1 of mass
    val twenty = (0 until 20).map(i => (f"g$i%02d", 5L))
    assert(gini(twenty) === ((20L, 100L, 0.0, 0.05, 0.1)))
  }

  test("benfordAudit: digit extraction, exclusions, all 9 rows, chi-square arithmetic") {
    val s = spark; import s.implicits._
    // leading digits: 1 (×3: 1.5, 0.019, 123.4), 9 (×1: -0.95), 2 (×1: 2e3 as 2000)
    // excluded: 0.0, NULL
    val vals = Seq(Some(1.5), Some(0.019), Some(123.4), Some(-0.95),
      Some(2000.0), Some(0.0), None).toDF("v")
    val got = Profile.benfordAudit(vals, col("v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet === (1 to 9).toSet, "all 9 digits emit, observed or not")
    assert(got(1)._1 === 3L && got(2)._1 === 1L && got(9)._1 === 1L)
    assert((3 to 8).forall(got(_)._1 === 0L))
    assert(got(1)._2 === 0.6, "N = 5: zeros and NULLs carry no leading digit")
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e1 = r6(math.log(2.0) / math.log(10.0))
    assert(got(1)._3 === e1)
    assert(got(1)._4 === r6((3 - 5 * e1) * (3 - 5 * e1) / (5 * e1)),
      "chi2 contribution over the rounded expectation")
    // an unobserved digit still contributes N·p to the statistic
    val e5 = r6(math.log(1.2) / math.log(10.0))
    assert(got(5)._4 === r6(5 * e5 * 5 * e5 / (5 * e5)))
  }

  test("functionalDependency: g3 by hand; key FD holds; NULL policy") {
    val sp = spark
    import sp.implicits._
    // det=1: values a,a,b -> plurality 2, violations 1
    // det=2: values c,c   -> holds
    // det=NULL row excluded entirely
    // det=3: NULL,NULL,d  -> NULLs group as a value: plurality 2, viol 1
    val df = Seq(
      (Some(1), Some("a")), (Some(1), Some("a")), (Some(1), Some("b")),
      (Some(2), Some("c")), (Some(2), Some("c")),
      (None, Some("z")),
      (Some(3), None), (Some(3), None), (Some(3), Some("d")))
      .toDF("det", "dep")
    val r = Profile.functionalDependency(df, "det", "dep", "t").collect().head
    assert(r.getAs[Long]("n_rows") === 8L)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Long]("g3_violations") === 2L)
    assert(!r.getAs[Boolean]("holds"))
    // a key determinant holds exactly
    val key = Seq((1, "x"), (2, "y"), (3, "y")).toDF("det", "dep")
    val kr = Profile.functionalDependency(key, "det", "dep", "k").collect().head
    assert(kr.getAs[Long]("g3_violations") === 0L)
    assert(kr.getAs[Boolean]("holds"))
  }

  test("functionalDependency: g3 equals the brute-force minimum deletions") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(400)((rnd.nextInt(20), rnd.nextInt(4)))
    val got = Profile.functionalDependency(
      rows.toDF("det", "dep"), "det", "dep", "r")
      .collect().head.getAs[Long]("g3_violations")
    val brute = rows.groupBy(_._1).map { case (_, g) =>
      g.size - g.groupBy(_._2).values.map(_.size).max }.sum
    assert(got === brute.toLong)
  }
}
