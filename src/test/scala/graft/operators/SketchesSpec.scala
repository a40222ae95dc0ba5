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
}
