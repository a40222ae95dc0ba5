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

  // ---- fitEm ----

  /** Independent sequential EM reference: per-PAIR posteriors (no
    * pattern grouping, different accumulation order) over collected
    * boolean rows — shares no code with the operator beyond the math. */
  private def refEm(
      rows: Seq[Array[Boolean]], iters: Int,
      p0: Double, m0: Double, u0: Double, eps: Double): (Double, Seq[(Double, Double)]) = {
    val k = rows.head.length
    def clamp(x: Double) = math.min(1.0 - eps, math.max(eps, x))
    var p = p0
    var m = Vector.fill(k)(m0)
    var u = Vector.fill(k)(u0)
    for (_ <- 1 to iters) {
      val w = rows.map { g =>
        val pm = p * (0 until k).map(i => if (g(i)) m(i) else 1 - m(i)).product
        val pu = (1 - p) * (0 until k).map(i => if (g(i)) u(i) else 1 - u(i)).product
        pm / (pm + pu)
      }
      val sw = w.sum
      val su = w.map(1.0 - _).sum
      p = clamp(sw / rows.size)
      m = Vector.tabulate(k)(i => clamp(
        rows.zip(w).collect { case (g, wi) if g(i) => wi }.sum / sw))
      u = Vector.tabulate(k)(i => clamp(
        rows.zip(w).collect { case (g, wi) if g(i) => 1.0 - wi }.sum / su))
    }
    (p, (0 until k).map(i => (m(i), u(i))))
  }

  /** Synthetic two-class pair fixture with known m/u/p — deterministic
    * congruential draws, no RNG state. */
  private def synthPairs(n: Int, pTrue: Double, ms: Seq[Double], us: Seq[Double]) = {
    def unit(seed: Long, i: Int, f: Int): Double = {
      // splitmix64 finalizer: a bare linear congruence leaves the f-lanes
      // correlated for fixed i (the simhash affine-family lesson) and the
      // "independent" fields aren't — which breaks EM's very model
      var z = seed + i * 0x9E3779B97F4A7C15L + f * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until n).map { i =>
      val isMatch = unit(99L, i, 17) < pTrue
      val params = if (isMatch) ms else us
      (i.toLong, params.indices.map(f => unit(7L, i, f) < params(f)))
    }
  }

  test("fitEm equals an independent per-pair sequential EM (different accumulation order)") {
    val s = spark
    import s.implicits._
    val data = synthPairs(400, 0.2, Seq(0.9, 0.8), Seq(0.05, 0.2))
    val df = data.map { case (id, gs) => (id, gs(0), gs(1)) }.toDF("id", "ga", "gb")
    val fields = Seq("fa" -> col("ga"), "fb" -> col("gb"))
    val got = Linkage.fitEm(df, fields, iters = 15)
    val (wantP, wantMu) = refEm(
      data.map(_._2.toArray), iters = 15, p0 = 0.1, m0 = 0.9, u0 = 0.1, eps = 1e-6)
    // tolerance: the two implementations sum in different orders
    // (patterns vs pairs), so low-bit float drift compounds per
    // iteration — agreement to 1e-7 after 15 rounds is the contract
    assert(math.abs(got.p - wantP) < 1e-7, s"p ${got.p} vs $wantP")
    got.fields.zip(wantMu).foreach { case ((name, m, u), (wm, wu)) =>
      assert(math.abs(m - wm) < 1e-7, s"$name m $m vs $wm")
      assert(math.abs(u - wu) < 1e-7, s"$name u $u vs $wu")
    }
  }

  test("fitEm recovers planted parameters within sampling error, and is partitioning-invariant") {
    val s = spark
    import s.implicits._
    // THREE fields: the two-class conditional-independence model is
    // identifiable only from K >= 3 binary fields (2^K - 1 cells must
    // cover 2K + 1 parameters; K = 2 gives 3 < 5 and EM drifts to a
    // different-but-equal-likelihood solution)
    val ms = Seq(0.95, 0.85, 0.9)
    val us = Seq(0.02, 0.15, 0.08)
    val data = synthPairs(20000, 0.15, ms, us)
    val df = data.map { case (id, gs) => (id, gs(0), gs(1), gs(2)) }
      .toDF("id", "ga", "gb", "gc")
    val fields = Seq("fa" -> col("ga"), "fb" -> col("gb"), "fc" -> col("gc"))
    val fit = Linkage.fitEm(df, fields, iters = 60)
    assert(math.abs(fit.p - 0.15) < 0.03, s"prior ${fit.p}")
    fit.fields.zip(ms.zip(us)).foreach { case ((name, m, u), (wm, wu)) =>
      assert(math.abs(m - wm) < 0.05, s"$name m $m vs planted $wm")
      assert(math.abs(u - wu) < 0.05, s"$name u $u vs planted $wu")
    }
    val again = Linkage.fitEm(df.repartition(13), fields, iters = 60)
    assert(again === fit, "fit must be a pure function of the candidate set")
    // and the fitted model feeds scoring directly
    val scored = Linkage.fellegiSunter(df, Linkage.toRules(fit, fields),
      upper = 3.0, lower = 0.0)
    assert(scored.where(col("decision") === "match").count() > 0)
  }

  test("q165's pinned EM estimate equals a fresh fit on the pin fixture") {
    // the pin exists so q165's DuckDB oracle can replay the scoring with
    // literal weights; a fixture regeneration would silently stale it
    // (the Q116Merges pattern)
    val fresh = Linkage.fitEm(
      graft.queries.ExtraQueries.q165Pairs(spark, "/root/testdata/sf0.001"),
      graft.queries.ExtraQueries.Q165Fields, iters = 30)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rounded = Linkage.EmEstimate(r6(fresh.p),
      fresh.fields.map { case (n, m, u) => (n, r6(m), r6(u)) })
    assert(rounded === graft.queries.ExtraQueries.Q165Fit,
      "re-pin ExtraQueries.Q165Fit from this fit")
  }

  test("fitEm: null agreements disagree; degenerate fields clamp instead of blowing up") {
    val s = spark
    import s.implicits._
    // ga always true (degenerate — would collapse to m=u=1 unclamped),
    // gb has nulls
    val df = Seq((1L, true, Some(true)), (2L, true, None), (3L, true, Some(false)))
      .toDF("id", "ga", "gb")
    val fit = Linkage.fitEm(df, Seq("fa" -> col("ga"), "fb" -> col("gb")), iters = 50)
    fit.fields.foreach { case (n, m, u) =>
      assert(m > 0 && m < 1 && u > 0 && u < 1, s"$n m=$m u=$u escaped the clamp")
    }
    intercept[IllegalArgumentException] {
      Linkage.fitEm(df, Seq.fill(17)(("f", lit(true))).zipWithIndex
        .map { case ((_, c), i) => (s"f$i", c) }, iters = 1)
    }
  }

  test("boundedBlockedPairs: calm blocks equal the plain equi-join exactly") {
    val s = spark
    import s.implicits._
    val left = (1L to 20L).map(i => (i, i % 4, f"name$i%03d")).toDF("lid", "lblk", "lname")
    val right = (1L to 20L).map(i => (i + 100L, i % 4, f"name$i%03d")).toDF("rid", "rblk", "rname")
    val plain = left.join(right, col("lblk") === col("rblk"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Linkage.boundedBlockedPairs(left, right, Seq("lblk" -> "rblk"),
        col("lname"), col("rname"), maxBlockPairs = 1000L, window = 2)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === plain, "under the cap every block takes the full cross")
  }

  test("boundedBlockedPairs: oversized blocks switch to windowed candidates, true matches survive") {
    val s = spark
    import s.implicits._
    // one hot block (0): 30x30 = 900 pairs > cap 100; each left row's
    // true match shares its sort key prefix, so it sorts adjacent
    val left = (1L to 30L).map(i => (i, 0L, f"person$i%03d")).toDF("lid", "lblk", "lname")
    val right = (1L to 30L).map(i => (i + 100L, 0L, f"PERSON$i%03d")).toDF("rid", "rblk", "rname")
    val out = Linkage.boundedBlockedPairs(left, right, Seq("lblk" -> "rblk"),
        lower(col("lname")), lower(col("rname")), maxBlockPairs = 100L, window = 3)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every true (i, i+100) pair is adjacent under lower(name) => kept
    (1L to 30L).foreach(i => assert(out.contains((i, i + 100L)), s"true pair $i lost"))
    // volume bounded: <= (nl + nr) * window, far below the 900 cross
    assert(out.size <= 60 * 3, s"windowed volume ${out.size} exceeds the bound")
    assert(out.size < 900, "the full cross must not run on a hot block")
    // determinism: repartitioned input yields the identical candidate set
    val out2 = Linkage.boundedBlockedPairs(left.repartition(7), right.repartition(5),
        Seq("lblk" -> "rblk"), lower(col("lname")), lower(col("rname")),
        maxBlockPairs = 100L, window = 3)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out2 === out)
    // window-completeness within the interleaved order: a pair whose
    // keys sort >window interleaved positions apart is never a candidate
    assert(!out.contains((1L, 130L)), "person001 vs PERSON030 are far apart in key order")
    intercept[IllegalArgumentException] {
      Linkage.boundedBlockedPairs(left, left, Seq("lblk" -> "lblk"),
        col("lname"), col("lname"))
    }
    // non-string sort keys are rejected: the engine would rank '10'<'9'
    // lexically while the SQL replay orders natively — fail loud
    val eKey = intercept[IllegalArgumentException] {
      Linkage.boundedBlockedPairs(left, right, Seq("lblk" -> "rblk"),
        col("lid"), col("rid"))
    }
    assert(eKey.getMessage.contains("sort keys must be STRING"))
  }
}
