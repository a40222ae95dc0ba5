package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Sketches]] gates: KMV estimator accuracy + small-group exact
  * fallback, CMS one-sided guarantee + mergeability, and the
  * broadcast-probe plan shape. */
class SketchesSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  test("kmvDistinct: ~1/sqrt(k) accuracy at n >> k; exact below k") {
    val df = (1L to 5000L).map(i => ("big", i)) ++
      (1L to 7L).map(i => ("tiny", i))
    val out = Sketches.kmvDistinct(df.toSeq.toDF("g", "key"), "g", "key",
        k = 256, salt = "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3))).toMap
    val (tinySeen, tinyEst) = out("tiny")
    assert(tinySeen === 7L && tinyEst === 7L, "below-k group must be exact")
    val (bigSeen, bigEst) = out("big")
    assert(bigSeen === 256L)
    // 3σ ≈ 3·n/√k ≈ 937 at n=5000, k=256
    assert(math.abs(bigEst - 5000L) < 1000,
      s"KMV estimate $bigEst too far from 5000")
  }

  test("kmvDistinct: estimate is a pure function of the key set") {
    val a = Sketches.kmvDistinct(
      (1L to 1000L).map(i => ("g", i)).toSeq.toDF("g", "key").repartition(3),
      "g", "key", k = 64, salt = "s").collect()
    val b = Sketches.kmvDistinct(
      // same keys, duplicated rows, different partitioning
      ((1L to 1000L) ++ (1L to 1000L)).map(i => ("g", i)).toSeq
        .toDF("g", "key").repartition(11),
      "g", "key", k = 64, salt = "s").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "duplicates and partitioning must not move the estimate")
  }

  test("cms: one-sided (est >= truth) for EVERY key; unseen keys read 0") {
    // zipfian-ish: key i appears i times, forcing real collisions at w=16
    val rows = (1L to 40L).flatMap(i => Seq.fill(i.toInt)(i))
    val df = rows.toSeq.toDF("key")
    val sk = Sketches.cmsSketch(df, "key", depth = 3, width = 16, salt = "c")
    val probes = (1L to 45L).toSeq.toDF("key")   // 41..45 never seen
    val est = Sketches.cmsEstimate(probes, sk, "key", depth = 3, width = 16,
        salt = "c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 40L).foreach { i =>
      assert(est(i) >= i, s"CMS underestimated key $i: ${est(i)} < $i")
    }
    (41L to 45L).foreach { i =>
      assert(est(i) >= 0L)
      // an unseen key may collide into occupied counters, but with all
      // three rows empty it must read 0, never NULL
    }
    assert(est.size === 45)
  }

  test("cms: sketch of a union == re-aggregated union of sketches") {
    val p1 = (1L to 30L).toSeq.toDF("key")
    val p2 = (20L to 50L).toSeq.toDF("key")
    val whole = Sketches.cmsSketch(p1.union(p2), "key", 3, 16, "m")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.cmsSketch(p1, "key", 3, 16, "m")
      .union(Sketches.cmsSketch(p2, "key", 3, 16, "m"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole === merged, "CMS grids must merge by re-aggregation")
  }

  test("cms probe plan: sketch joins broadcast, probes never shuffle for the lookup") {
    val df = (1L to 100L).toSeq.toDF("key")
    val sk = Sketches.cmsSketch(df, "key", 3, 16, "p")
    val plan = Sketches.cmsEstimate(df, sk, "key", 3, 16, "p")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch lookup must broadcast the grid:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probe side must not shuffle for the lookup:\n$plan")
  }

  test("cmsJoinSize: one-sided under forced collisions; exact at collision-free width") {
    val a = (1L to 50L).flatMap(i => Seq.fill((i % 3).toInt + 1)(i)).toDF("key")
    val b = (25L to 80L).flatMap(i => Seq.fill((i % 2).toInt + 1)(i)).toDF("key")
    // true inner product: sum over shared keys 25..50 of fa*fb
    val truth = (25L to 50L).map(i => ((i % 3) + 1) * ((i % 2) + 1)).sum
    // tiny width: heavy collisions, estimate must stay >= truth
    val tight = Sketches.cmsJoinSize(
      Sketches.cmsSketch(a, "key", 3, 4, "js"),
      Sketches.cmsSketch(b, "key", 3, 4, "js"), depth = 3)
      .collect().head.getLong(0)
    assert(tight >= truth, s"collided estimate $tight below true $truth")
    // wide grid: 80 keys into 4096 buckets x 3 rows — if any row is
    // collision-free among the shared keys the min hits the true value;
    // at minimum the estimate stays one-sided and close
    val wide = Sketches.cmsJoinSize(
      Sketches.cmsSketch(a, "key", 3, 4096, "js"),
      Sketches.cmsSketch(b, "key", 3, 4096, "js"), depth = 3)
      .collect().head.getLong(0)
    assert(wide >= truth && wide <= truth * 2,
      s"wide-grid estimate $wide far from true $truth")
  }

  test("cmsJoinSize: disjoint key sets estimate 0 (never NULL) once any depth row separates them") {
    val a = (1L to 30L).toDF("key")
    val b = (1000L to 1030L).toDF("key")
    // wide grid: disjoint keys land in disjoint buckets, so at least one
    // row (in fact all) has zero overlap -> the min must report 0
    val est = Sketches.cmsJoinSize(
      Sketches.cmsSketch(a, "key", 3, 4096, "dz"),
      Sketches.cmsSketch(b, "key", 3, 4096, "dz"), depth = 3)
      .collect().head
    assert(!est.isNullAt(0) && est.getLong(0) === 0L,
      "a zero-overlap depth row proves join size 0; dropped rows would inflate it")
  }

  test("hllDistinct equals a sequential register reference; ~13% accuracy at m=64") {
    val keys = (1L to 4000L).map(i => ("big", i)) ++ (1L to 9L).map(i => ("few", i))
    val df = (keys ++ keys).toDF("g", "key") // duplicated input: pure set function
    val out = Sketches.hllDistinct(df, "g", "key", m = 64, salt = "h1")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // sequential reference straight from the definition, over the SAME hash
    val hashes = df.select(col("g"),
        Sketches.keyHash(col("key"), "h1").as("h")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for (g <- Seq("big", "few")) {
      val regs = Array.fill(64)(0)
      hashes.filter(_._1 == g).foreach { case (_, h) =>
        val j = (h % 64).toInt
        val w = h / 64
        val rho = if (w == 0L) 27 else java.lang.Long.numberOfTrailingZeros(w) + 1
        regs(j) = math.max(regs(j), rho)
      }
      val sScaled = regs.map(m => 1L << (27 - m)).sum
      val vZero = regs.count(_ == 0).toLong
      val est = BigDecimal(0.709 * 64 * 64 * (1L << 27).toDouble / sScaled.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(g) === ((64L, vZero, sScaled, est)), s"group $g")
    }
    // accuracy: 3σ ≈ 3·1.04/√64 ≈ 39%; assert a loose 35% at n=4000
    assert(math.abs(out("big")._4 - 4000.0) < 1400, s"est ${out("big")._4}")
  }

  test("hllDistinct registers merge by max: union sketch == sketch of union") {
    val a = (1L to 700L).map(i => ("g", i)).toDF("g", "key")
    val b = (500L to 1200L).map(i => ("g", i)).toDF("g", "key")
    val direct = Sketches.hllDistinct(a.union(b), "g", "key", salt = "m")
      .collect().head
    // simulate the persisted-partition merge: re-aggregate the union of
    // the two raw inputs (register max IS re-aggregation — same path)
    val merged = Sketches.hllDistinct(b.union(a), "g", "key", salt = "m")
      .collect().head
    assert(direct.toSeq === merged.toSeq)
  }

  test("hllOverlap: union registers are EXACT sketch algebra; overlap tracks truth") {
    // A = 1..3000, B = 2000..5000 (overlap 1001), C disjoint 9000..9400
    val rows = (1L to 3000L).map(("A", _)) ++
      (2000L to 5000L).map(("B", _)) ++ (9000L to 9400L).map(("C", _))
    val df = rows.toDF("g", "key")
    val out = Sketches.hllOverlap(df, "g", "key", m = 64, salt = "ov")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    // the union's harmonic sum must equal hllDistinct over the merged
    // slices EXACTLY — max-merge of registers IS the union sketch
    val abUnion = Sketches.hllDistinct(
        df.where(col("g") =!= "C").withColumn("g", lit("AB")),
        "g", "key", m = 64, salt = "ov").collect().head
    assert(out(("A", "B")).getLong(4) === abUnion.getLong(3),
      "s_union must equal the directly-sketched union's s_scaled")
    // overlap estimates: A∩B = 1001 true; HLL σ at m=64 ≈ 13% of EACH
    // estimate, so the difference carries ~3x that absolute noise
    val estAB = out(("A", "B")).getDouble(8)
    assert(math.abs(estAB - 1001.0) < 1300, s"A∩B est $estAB")
    val estAC = out(("A", "C")).getDouble(8)
    assert(estAC < 700, s"disjoint overlap est $estAC should be near 0")
    out.values.foreach(r => assert(r.getDouble(8) >= 0.0, "clamped at 0"))
  }

  test("hdrBounds: lo <= v <= hi, width-1 below 2^s, relative width <= 2^-s above") {
    val rnd = new scala.util.Random(5)
    val vs = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 1023L) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 500000000L)
    val df = vs.toDF("v")
    Sketches.withHdrBounds(df, "v", subBits = 5)
      .select("v", "lo", "hi").collect().foreach { r =>
      val (v, l, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(l <= v && v <= h, s"v=$v not in [$l, $h]")
      if (v < 32) assert(l === v && h === v, s"exact range violated at $v")
      else assert((h - l + 1).toDouble / l <= 1.0 / 32 + 1e-12,
        s"relative width at $v: [$l, $h]")
    }
    intercept[Exception] {
      Sketches.withHdrBounds(Seq(-1L).toDF("v"), "v", 5)
        .select("lo").collect()
    }
  }

  test("hdrQuantiles: bucket brackets the exact k-th order statistic at every q") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(_ => ("a", math.abs(rnd.nextLong()) % 10000000L)) ++
      (1 to 500).map(i => ("b", i.toLong))
    val df = rows.toDF("g", "v")
    val qs = Seq("p01" -> 0.01, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99, "p100" -> 1.0)
    val got = Sketches.hdrQuantiles(df, "g", "v", qs, subBits = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    for (((g, name), (q, n, lo, hi)) <- got) {
      val vals = byG(g)
      assert(n === vals.length.toLong)
      val k = math.max(1L, math.ceil(q * n).toLong)
      val exact = vals((k - 1).toInt)
      assert(lo <= exact && exact <= hi,
        s"$g/$name: exact $exact outside bucket [$lo, $hi]")
    }
    assert(got.size === 10, "5 quantiles x 2 groups")
  }

  test("hdrHistogram merges by count re-aggregation; partition-invariant") {
    val rows = (1L to 2000L).map(i => ("g", i * 37 % 100000))
    val df = rows.toDF("g", "v")
    val one = Sketches.hdrHistogram(df.repartition(1), "g", "v")
      .collect().map(_.toSeq).toSet
    val many = Sketches.hdrHistogram(df.repartition(13), "g", "v")
      .collect().map(_.toSeq).toSet
    assert(one === many)
    // merge = summed counts: histogram(A++B) == combine(histogram(A), histogram(B))
    val (a, b) = rows.splitAt(900)
    val ha = Sketches.hdrHistogram(a.toDF("g", "v"), "g", "v")
    val hb = Sketches.hdrHistogram(b.toDF("g", "v"), "g", "v")
    val combined = ha.union(hb).groupBy("g", "lo", "hi")
      .agg(sum("cnt").as("cnt")).collect().map(_.toSeq).toSet
    assert(combined === one)
  }

  test("hdrHistogram rejects fractional value columns — no silent truncation") {
    // 2.7 would silently floor to 2 under cast('long'); the contract is
    // pre-quantization (round(v*10^d)), enforced like Trend.cusum
    val df = Seq(("g", 2.7), ("g", 3.1)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.hdrHistogram(df, "g", "v")
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("amsSketch: signs are ±1 per hash parity; geometry-sized; partition-invariant") {
    val df = (1L to 500L).map(i => i % 37).toSeq.toDF("key")
    val sk = Sketches.amsSketch(df, "key", depth = 3, reps = 8, salt = "a")
      .collect()
    assert(sk.length === 24, "one counter per (grp, rep), data-size-free")
    // every |z| <= row count, parity of z matches parity of n (each row
    // contributes exactly +1 or -1)
    sk.foreach { r =>
      val z = r.getLong(2)
      assert(math.abs(z) <= 500L && ((z % 2 + 2) % 2) === (500L % 2))
    }
    val sk2 = Sketches.amsSketch(df.repartition(11), "key", 3, 8, "a")
      .collect().map(_.toSeq).toSet
    assert(sk2 === sk.map(_.toSeq).toSet,
      "partitioning must not move the counters")
  }

  test("amsSketch: sketch of a union == per-(grp,rep) summed union of sketches") {
    val p1 = (1L to 300L).map(_ % 21).toSeq.toDF("key")
    val p2 = (1L to 200L).map(_ % 13).toSeq.toDF("key")
    val whole = Sketches.amsSketch(p1.union(p2), "key", 3, 8, "m")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = Sketches.amsSketch(p1, "key", 3, 8, "m")
      .union(Sketches.amsSketch(p2, "key", 3, 8, "m"))
      .groupBy("grp", "rep").agg(sum("z").as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(whole === merged, "AMS counters must merge by per-cell SUM")
  }

  test("bloom: NEVER a false negative; false positives appear at tight geometry") {
    val members = (1L to 100L).toSeq.toDF("key")
    // roomy filter: every member must probe true
    val sk = Sketches.bloomSketch(members, "key", bits = 2048, hashes = 3,
      salt = "b")
    val got = Sketches.bloomContains(members, sk, "key", 2048, 3, "b")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size === 100 && got.values.forall(identity),
      "a Bloom filter must never reject a member")
    // tight filter (64 bits, 100 keys): non-members MUST collide often
    val tight = Sketches.bloomSketch(members, "key", bits = 64, hashes = 3,
      salt = "b")
    val fp = Sketches.bloomContains(
        (1000L to 1100L).toSeq.toDF("key"), tight, "key", 64, 3, "b")
      .collect().count(_.getBoolean(1))
    assert(fp > 50, s"saturated 64-bit filter should flag most probes, got $fp")
  }

  test("scaledBits: derived geometry bounds the FP rate where pinned bits saturate") {
    // the integer rule itself
    assert(Sketches.scaledBits(0L) === 2048L)
    assert(Sketches.scaledBits(100L) === 2048L)
    assert(Sketches.scaledBits(5000L) === 50000L)
    assert(Sketches.scaledBits(5000L, bitsPerKey = 16, minBits = 4096L) === 80000L)
    intercept[IllegalArgumentException] { Sketches.scaledBits(-1L) }
    // saturation: 20k keys into a PINNED 2048-bit filter fills
    // 1−e^(−3n/m) ≈ 1 of the bits — the FP rate collapses toward 1 and
    // a prefilter built on it passes everything through
    val members = (1L to 20000L).toSeq.toDF("key")
    val probes = (1000000L to 1002000L).toSeq.toDF("key")
    val pinned = Sketches.bloomSketch(members, "key", bits = 2048L, hashes = 3,
      salt = "sat")
    val fpPinned = Sketches.bloomContains(probes, pinned, "key", 2048L, 3, "sat")
      .collect().count(_.getBoolean(1)) / 2001.0
    assert(fpPinned > 0.9, s"pinned 2048 bits at n=20000 must saturate, got $fpPinned")
    // derived: bits = max(2048, 10n) holds the rate at the formula
    // bound (1−e^(−kn/m))^k ≈ 1.7% at k = 3, m = 10n — assert ≤ 2×
    val m = Sketches.scaledBits(20000L)
    val scaled = Sketches.bloomSketch(members, "key", bits = m, hashes = 3,
      salt = "sat")
    val fpScaled = Sketches.bloomContains(probes, scaled, "key", m, 3, "sat")
      .collect().count(_.getBoolean(1)) / 2001.0
    val bound = math.pow(1.0 - math.exp(-3.0 * 20000.0 / m.toDouble), 3)
    assert(fpScaled <= 2.0 * bound,
      s"derived geometry must hold the formula rate: got $fpScaled vs bound $bound")
  }

  test("bloom: sketch of a union == union+distinct of sketches; duplicate bits harmless") {
    val p1 = (1L to 60L).toSeq.toDF("key")
    val p2 = (40L to 90L).toSeq.toDF("key")
    val whole = Sketches.bloomSketch(p1.union(p2), "key", 512, 3, "m")
      .collect().map(_.getLong(0)).toSet
    val skA = Sketches.bloomSketch(p1, "key", 512, 3, "m")
    val skB = Sketches.bloomSketch(p2, "key", 512, 3, "m")
    val merged = skA.union(skB).distinct().collect().map(_.getLong(0)).toSet
    assert(whole === merged, "Bloom sketches must merge by union (OR)")
    // a merge WITHOUT the distinct (duplicated bits) must not flip a
    // member to false — the defensive distinct inside bloomContains
    val got = Sketches.bloomContains(
        (40L to 60L).toSeq.toDF("key"), skA.union(skB), "key", 512, 3, "m")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.values.forall(identity),
      "duplicate sketch bits must never produce a false negative")
  }

  test("bloom probe plan: the occupied-bit frame joins broadcast") {
    val df = (1L to 50L).toSeq.toDF("key")
    val sk = Sketches.bloomSketch(df, "key", 256, 3, "p")
    val plan = Sketches.bloomContains(df, sk, "key", 256, 3, "p")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probes must look bits up via a broadcast join, never shuffle")
  }

  test("amsF2: estimate within the median-of-means band; even depth rejected") {
    // key i in 1..50 appears i times -> F2 = sum i^2 = 42925
    val rows = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i))
    val trueF2 = (1L to 50L).map(i => i * i).sum
    val est = Sketches.amsF2(rows.toSeq.toDF("key"), "key",
        depth = 3, reps = 8, salt = "f").collect().head
    assert(est.getLong(0) === 3L && est.getLong(1) === 8L)
    val f2 = est.getDouble(3)
    // E[z^2] = F2; mean-of-8 std ~ F2/2, median-of-3 keeps the
    // constant-probability band — with this fixed salt the draw is
    // deterministic, assert the textbook 2x band holds for it
    assert(f2 > trueF2 * 0.5 && f2 < trueF2 * 2.0,
      s"est $f2 vs true $trueF2 outside the 2x band")
    // est_f2 must equal s_med/reps exactly (power-of-two reps)
    assert(f2 === est.getDecimal(2).doubleValue() / 8.0)
    intercept[IllegalArgumentException] {
      Sketches.amsF2(rows.toSeq.toDF("key"), "key", depth = 4)
    }
  }
}
