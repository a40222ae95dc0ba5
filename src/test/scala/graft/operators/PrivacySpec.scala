package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Privacy]] — the k-anonymity / l-diversity decision rules on hand
  * fixtures: class-size accounting, the smallest-class verdict, the
  * homogeneity case l-diversity exists to catch, NULL-as-a-value. */
class PrivacySpec extends SparkSpecBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    // classes by (zip, age): (10, 30) x3 rows; (10, 40) x2; (20, 30) x1
    Seq((10, 30, "flu"), (10, 30, "flu"), (10, 30, "cold"),
        (10, 40, "flu"), (10, 40, "cough"),
        (20, 30, "flu"))
      .toDF("zip", "age", "dx")
  }

  test("kAnonymityProfile: class-size histogram with row shares") {
    val out = Privacy.kAnonymityProfile(fixture, Seq("zip", "age"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1L, 1L, 0.166667), (2L, 1L, 2L, 0.333333),
      (3L, 1L, 3L, 0.5)))
  }

  test("kAnonymityRisk: verdict at k; the singleton is the at-risk row") {
    val r = Privacy.kAnonymityRisk(fixture, Seq("zip", "age"), k = 2L).collect().head
    assert(r.getLong(0) === 1L)              // rows_at_risk: the (20,30) singleton
    assert(r.getDouble(1) === 0.166667)
    assert(r.getLong(2) === 1L)              // k_anonymity = smallest class
    assert(!r.getBoolean(3))
    val ok = Privacy.kAnonymityRisk(
      fixture.where(col("zip") === 10), Seq("zip", "age"), k = 2L).collect().head
    assert(ok.getBoolean(3), "without the singleton the release is 2-anonymous")
  }

  test("lDiversityProfile: the homogeneity case — big class, one sensitive value") {
    val s = spark
    import s.implicits._
    // class A: 4 rows, all 'flu' (1-diverse); class B: 2 rows, 2 values
    val df = Seq(("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
      ("b", "flu"), ("b", "cold")).toDF("zip", "dx")
    val out = Privacy.lDiversityProfile(df, Seq("zip"), "dx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L)))
  }

  test("NULLs are values on both sides: QI nulls form a class, sensitive nulls count") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1), Some("x")), (None, Some("x")), (None, None))
      .toDF("zip", "dx")
    val prof = Privacy.kAnonymityProfile(df, Seq("zip")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(prof === Map(1L -> 1L, 2L -> 1L), "the two NULL-zip rows are one class")
    val ld = Privacy.lDiversityProfile(df, Seq("zip"), "dx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ld === Map(1L -> 1L, 2L -> 1L), "NULL dx is a distinct sensitive value")
  }

  test("validation: sensitive column must not be a QI") {
    intercept[IllegalArgumentException] {
      Privacy.lDiversityProfile(fixture, Seq("zip", "dx"), "dx")
    }
  }

  test("dpNoisyCounts: deterministic per (key, seed), noise scales exactly 1/eps, bounded") {
    val s = spark
    import s.implicits._
    val df = (0 until 300).map(i => (s"g${i % 7}", i)).toDF("g", "x")
    def noisy(eps: Double, seed: String): Map[String, Double] =
      Privacy.dpNoisyCounts(df, Seq("g"), eps, seed)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val trueCounts = df.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = noisy(0.5, "s1")
    assert(a === noisy(0.5, "s1"), "a release must be reproducible")
    assert(a === Privacy.dpNoisyCounts(df.repartition(11), Seq("g"), 0.5, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap,
      "noise keys on content, not partitioning")
    assert(a !== noisy(0.5, "s2"), "a different seed is a different draw")
    val noiseA = a.map { case (k, v) => k -> (v - trueCounts(k)) }
    assert(noiseA.values.exists(n => math.abs(n) > 1e-6), "noise actually present")
    // |Laplace(1/eps)| <= (1/eps) * ln(2P) with the (h+0.5)/P uniform
    assert(noiseA.values.forall(n => math.abs(n) <= 2.0 * 43.0), s"noise unbounded: $noiseA")
    // same seed => same uniform => the draw scales EXACTLY with 1/eps
    val b = noisy(5.0, "s1")
    noiseA.foreach { case (k, n) =>
      val n10 = b(k) - trueCounts(k)
      assert(math.abs(n - 10.0 * n10) < 1e-3, s"$k: $n vs 10x$n10")
    }
  }

  test("dpNoisyMean: clamp binds, noise bounded, reproducible, floor guards the denominator") {
    val s = spark; import s.implicits._
    val rows = Seq(("a", 10.0), ("a", 20.0), ("a", 999.0), // 999 clamps to 100
      ("b", 50.0)).toDF("k", "v")
    def run(seed: String) = Privacy.dpNoisyMean(rows, Seq("k"), $"v",
        lo = 0.0, hi = 100.0, epsilon = 1.0, seed = seed)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m = run("s1")
    assert(m === run("s1"), "seeded release is reproducible")
    assert(m !== run("s2"), "a different seed is a different release")
    // clamped mean for a = (10+20+100)/3; |noise| <= scale*ln(2P) on both
    // numerator (scale 200) and denominator (scale 2, floored at 1)
    val trueA = 130.0 / 3
    val bound = (130.0 + 200.0 * 43.0) / 1.0 // worst numerator / floored denom
    assert(m("a") != trueA, "noise actually present")
    assert(math.abs(m("a")) <= bound, s"release unbounded: ${m("a")}")
    // repartitioning must not change the release (exact decimal sums)
    val repart = Privacy.dpNoisyMean(rows.repartition(7), Seq("k"), $"v",
        0.0, 100.0, 1.0, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(repart === m, "partition-order-free")
  }

  test("dpNoisyCounts: a public keyDomain hides group presence (absent keys get 0 + noise)") {
    val s = spark
    import s.implicits._
    val data = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "x")
    val domain = Seq("a", "b", "c", "d").toDF("g")
    val out = Privacy.dpNoisyCounts(data, Seq("g"), 1.0, "n1",
        keyDomain = domain)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set("a", "b", "c", "d"),
      "every domain key is emitted, observed or not")
    // absent keys carry pure noise around 0 — bounded by scale*ln(2P)
    assert(math.abs(out("c")) <= 43.0 && math.abs(out("d")) <= 43.0)
    assert(out("c") !== out("d"), "per-key noise, not one shared draw")
    // noise for PRESENT keys is identical with and without the domain
    // (the domain changes the emitted set, not the mechanism)
    val bare = Privacy.dpNoisyCounts(data, Seq("g"), 1.0, "n1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bare === out.filter(kv => Set("a", "b")(kv._1)))
    // an empty seed (no release nonce) fails loud
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyCounts(data, Seq("g"), 1.0, "")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyMean(data, Seq("g"), $"x", 0.0, 10.0, 1.0, "")
    }
  }
}
