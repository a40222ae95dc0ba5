package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Layout]] — the next-fit-decreasing bound on compaction groups and
  * the interval-overlap health arithmetic, on hand fixtures. */
class LayoutSpec extends SparkSpecBase {

  test("compactionPlan: next-fit-decreasing — groups contiguous by size, bound holds") {
    val s = spark
    import s.implicits._
    val files = Seq(("a", 70L), ("b", 60L), ("c", 40L), ("d", 30L), ("e", 10L))
      .toDF("file", "bytes")
    val plan = Layout.compactionPlan(files, "file", "bytes", targetBytes = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // size-desc prefix sums: a:0, b:70, c:130, d:170, e:200
    // div 100 -> groups {a,b}, {c,d}, {e}
    assert(plan === Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 1L, "e" -> 2L))
  }

  test("compactionPlan: the NFD bound — each group <= target + its largest file; oversized files alone") {
    val s = spark
    import s.implicits._
    val sizes = Seq(250L, 90L, 80L, 75L, 60L, 55L, 40L, 30L, 20L, 10L, 5L)
    val files = sizes.zipWithIndex.map { case (b, i) => (s"f$i", b) }.toDF("file", "bytes")
    val target = 100L
    val plan = Layout.compactionPlan(files, "file", "bytes", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    plan.groupBy(_._3).foreach { case (g, members) =>
      val tot = members.map(_._2).sum
      val biggest = members.map(_._2).max
      assert(tot <= target + biggest, s"group $g total $tot breaks the NFD bound")
    }
    // the 250-byte file exceeds the target: first in order, owns groups 0-2
    // worth of offset space, and no other file shares its group... verify
    // it is alone in its group
    val bigGrp = plan.find(_._2 === 250L).get._3
    assert(plan.count(_._3 === bigGrp) === 1, "oversized file must compact alone")
  }

  test("compactionPlan: exact agreement with a sequential NFD reference on random manifests") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val target = 50L + rnd.nextInt(400)
      val sizes = (0 until n).map(i => (f"f$i%03d", 1L + rnd.nextInt(300).toLong))
      // sequential reference: size-desc (file-tiebroken) exclusive
      // prefix sums, group = prefix div target
      val ordered = sizes.sortBy { case (f, b) => (-b, f) }
      val expect = ordered.zip(ordered.scanLeft(0L)(_ + _._2).dropRight(1))
        .map { case ((f, _), off) => f -> off / target }.toMap
      val got = Layout.compactionPlan(sizes.toDF("file", "bytes"), "file", "bytes", target)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got === expect, s"trial $trial (n=$n target=$target)")
    }
  }

  test("clusteringHealth: disjoint ranges score 0; full overlap scores 1; nesting counts") {
    val s = spark
    import s.implicits._
    def health(rs: Seq[(String, Long, Long)]) =
      Layout.clusteringHealth(rs.toDF("f", "lo", "hi"), "f", "lo", "hi")
        .collect().head
    val disjoint = health(Seq(("a", 0L, 9L), ("b", 10L, 19L), ("c", 20L, 29L)))
    assert(disjoint.getLong(1) === 0L && disjoint.getBoolean(3))
    val nested = health(Seq(("a", 0L, 100L), ("b", 10L, 20L), ("c", 200L, 300L)))
    assert(nested.getLong(1) === 1L && !nested.getBoolean(3))
    val all = health(Seq(("a", 0L, 50L), ("b", 25L, 75L), ("c", 40L, 90L)))
    assert(all.getLong(1) === 3L && all.getDouble(2) === 1.0)
    // touching endpoints overlap (closed intervals — parquet min/max are inclusive)
    val touch = health(Seq(("a", 0L, 10L), ("b", 10L, 20L)))
    assert(touch.getLong(1) === 1L)
    // single file: trivially clustered
    val one = health(Seq(("a", 0L, 10L)))
    assert(one.getDouble(2) === 0.0 && one.getBoolean(3))
  }

  test("clusteringHealth: sweep-line equals the pairwise-join oracle on random manifests") {
    val s = spark
    import s.implicits._
    // the production path is the O(n log n) event sweep; the retired
    // O(n²) interval self-join stays here as the property oracle
    val rnd = new scala.util.Random(158)
    (1 to 25).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val rs = (0 until n).map { i =>
        val lo = rnd.nextInt(200).toLong - 100L
        (f"f$i%03d", lo, lo + rnd.nextInt(60).toLong)
      }
      val expectPairs = (for {
        a <- rs; b <- rs
        if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
      } yield 1).size.toLong
      val got = Layout.clusteringHealth(rs.toDF("f", "lo", "hi"), "f", "lo", "hi")
        .collect().head
      assert(got.getLong(0) === n.toLong, s"trial $trial n_files")
      assert(got.getLong(1) === expectPairs, s"trial $trial (n=$n) overlap_pairs")
      assert(got.getBoolean(3) === (expectPairs == 0L), s"trial $trial well_clustered")
    }
  }

  test("clusteringHealth: NULL bounds pair with nothing but count in n_files; lo > hi fails loud") {
    val s = spark
    import s.implicits._
    val withNull = Seq(("a", Some(0L), Some(50L)), ("b", None, Some(75L)), ("c", Some(25L), Some(60L)))
      .toDF("f", "lo", "hi")
    val r = Layout.clusteringHealth(withNull, "f", "lo", "hi").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 1L)
    // degenerate: every row stat-less -> empty sweep, zero pairs, well-clustered
    val allNull = Seq(("a", Option.empty[Long], Option.empty[Long]),
      ("b", Option.empty[Long], Option.empty[Long])).toDF("f", "lo", "hi")
    val rn = Layout.clusteringHealth(allNull, "f", "lo", "hi").collect().head
    assert(rn.getLong(0) === 2L && rn.getLong(1) === 0L && rn.getBoolean(3))
    val bad = Seq(("a", 10L, 0L), ("b", 0L, 5L)).toDF("f", "lo", "hi")
    val ex = intercept[Exception] {
      Layout.clusteringHealth(bad, "f", "lo", "hi").collect()
    }
    assert(ex.getMessage != null)
  }

  test("pruningEstimate: hand-computed skipping, NULL zones always read, plan broadcasts") {
    val s = spark; import s.implicits._
    val man = Seq(
      ("f1", 100L, Some(0L), Some(9L)),
      ("f2", 200L, Some(10L), Some(19L)),
      ("f3", 400L, Some(20L), Some(29L)),
      ("f4", 800L, None, None)            // stat-less: unprunable
    ).toDF("file", "bytes", "lo", "hi")
    val qs = Seq((1L, 0L, 9L), (2L, 15L, 25L), (3L, 100L, 200L))
      .toDF("qid", "qlo", "qhi")
    val est = Layout.pruningEstimate(man, qs, "file", "bytes", "lo", "hi")
    val got = est.collect().map(r => r.getLong(0) ->
      ((r.getLong(4), r.getLong(6), r.getDouble(7), r.getDouble(8)))).toMap
    // q1 hits f1 only (+f4 unprunable): 2 files, 900 bytes
    assert(got(1L) === ((2L, 900L, 0.5, 1.0 - 900.0 / 1500.0)))
    // q2 straddles f2/f3 (+f4): 3 files
    assert(got(2L)._1 === 3L && got(2L)._2 === 1400L)
    // q3 misses every zone: only the stat-less file reads
    assert(got(3L) === ((1L, 800L, 0.75, 0.466667)), "ratios round to 6")
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      s"query side must broadcast:\n$plan")
  }
}
