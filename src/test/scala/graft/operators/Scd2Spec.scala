package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Changes.scd2History]] gates: run-collapse into versioned intervals,
  * half-open no-gap/no-overlap bounds, null-safe value transitions, tied
  * business-time zero-length intervals, point-in-time lookup, and the
  * one-exchange plan contract (both windows chain over a single shuffle).
  */
class Scd2Spec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  private def hist(rows: Seq[(Long, Long, Long, String)]) =
    Changes.scd2History(
      rows.toDF("k", "seq", "t", "v"),
      keyCols = Seq(col("k")),
      orderCols = Seq(col("t"), col("seq")),
      effectiveFrom = col("t"),
      valueCols = Seq(col("v")))

  test("collapses runs into versions; intervals chain half-open") {
    val out = hist(Seq(
        (1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"),
        (1L, 4L, 40L, "b"), (1L, 5L, 50L, "a")))
      .select("k", "version", "v", "effective_from", "effective_to", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(_._2)
    assert(out === Seq(
      (1L, 1L, "a", 10L, Some(30L), false),
      (1L, 2L, "b", 30L, Some(50L), false),
      (1L, 3L, "a", 50L, None, true)))
    // no gap, no overlap: each effective_to equals the next effective_from
    out.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._5.contains(b._4))
      case _ => ()
    }
  }

  test("NULL value runs: NULL→value and value→NULL both open versions") {
    val df = Seq[(Long, Long, Long, Option[String])](
        (7L, 1L, 1L, None), (7L, 2L, 2L, None),
        (7L, 3L, 3L, Some("x")), (7L, 4L, 4L, None))
      .toDF("k", "seq", "t", "v")
    val out = Changes.scd2History(df, Seq(col("k")),
        Seq(col("t"), col("seq")), col("t"), Seq(col("v")))
      .select("version", "v").as[(Long, Option[String])].collect().sortBy(_._1)
    assert(out === Seq((1L, None), (2L, Some("x")), (3L, None)))
  }

  test("tied business time: earlier-by-tiebreaker version is zero-length") {
    val out = hist(Seq((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b")))
      .select("version", "v", "effective_from", "effective_to")
      .as[(Long, String, Long, Option[Long])].collect().sortBy(_._1)
    assert(out === Seq((1L, "a", 10L, Some(10L)), (2L, "b", 10L, None)))
  }

  test("keys evolve independently; single key version counters restart") {
    val out = hist(Seq(
        (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"),
        (2L, 3L, 10L, "b"), (2L, 4L, 20L, "b")))
      .select("k", "version", "v", "is_current")
      .as[(Long, Long, String, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out === Seq(
      (1L, 1L, "a", false), (1L, 2L, "b", true),
      (2L, 1L, "b", true)))
  }

  test("scd2AsOf picks exactly the version covering the instant") {
    val h = hist(Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 30L, "b"), (1L, 3L, 50L, "c")))
    def at(t: Long) = Changes.scd2AsOf(h, lit(t))
      .select("v").as[String].collect().toSeq
    assert(at(9L) === Nil)          // before history opens
    assert(at(10L) === Seq("a"))    // inclusive lower bound
    assert(at(29L) === Seq("a"))
    assert(at(30L) === Seq("b"))    // exclusive upper bound
    assert(at(999L) === Seq("c"))   // open current interval
  }

  test("plan: both window passes share ONE exchange, no join") {
    val plan = hist(Seq((1L, 1L, 10L, "a"))).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Join"), "scd2History must not plan a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected the two window passes to chain over one exchange, got $exchanges:\n$plan")
  }

  test("scd2Enrich: each fact joins the version valid AT ITS OWN ts; transition instant sees the NEW version") {
    val h = hist(Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b")))
    val facts = Seq((1L, 100L, 5L), (1L, 101L, 10L), (1L, 102L, 19L),
        (1L, 103L, 20L), (1L, 104L, 30L))
      .toDF("k", "fact_id", "t_f")
    val out = Changes.scd2Enrich(facts, h, Seq("k"), "t_f")
      .select("fact_id", "version", "v", "is_current")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          Option(r.getString(2)))).toMap
    assert(out.size === 5, "facts never dropped, at most one version each")
    assert(out(100L) === ((None, None)), "pre-history fact keeps NULL dims")
    assert(out(101L) === ((Some(1L), Some("a"))), "inclusive lower bound")
    assert(out(102L) === ((Some(1L), Some("a"))))
    assert(out(103L) === ((Some(2L), Some("b"))), "transition instant -> NEW version")
    assert(out(104L) === ((Some(2L), Some("b"))), "open current interval")
  }

  test("scd2Enrich: colliding fact/history column names fail fast") {
    val h = hist(Seq((1L, 1L, 10L, "a")))
    val facts = Seq((1L, 5L, "x")).toDF("k", "t_f", "v") // 'v' collides
    intercept[IllegalArgumentException] {
      Changes.scd2Enrich(facts, h, Seq("k"), "t_f")
    }
  }
}
