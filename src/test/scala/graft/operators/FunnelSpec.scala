package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpecBase {

  test("funnelCounts: order-sensitive chaining on a hand event log") {
    val s = spark; import s.implicits._
    // u1 completes in order; u2 clicks BEFORE its view (click must not
    // count — no click after t1); u3 views only; u4 has view>click but
    // its purchase precedes the click
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L),
      (4L, "view", 10L), (4L, "purchase", 15L), (4L, "click", 20L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows === Array(
      (1, "view", 4L, 1.0),
      (2, "view>click", 2L, 0.5),          // u1, u4
      (3, "view>click>purchase", 1L, 0.25) // u1 only — u4's purchase too early
    ))
  }

  test("funnelCounts: greedy earliest-completion finds any valid assignment") {
    val s = spark; import s.implicits._
    // u1: view@10, view@50, click@20, purchase@30 — the SECOND view would
    // miss the funnel; greedy takes view@10 and completes. A user
    // completes iff ANY in-order assignment exists.
    val e = Seq(
      (1L, "view", 10L), (1L, "view", 50L), (1L, "click", 20L), (1L, "purchase", 30L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows === Array((1, 1L), (2, 1L), (3, 1L)))
  }

  test("funnelCounts: equal timestamps do not chain (strictly-after rule)") {
    val s = spark; import s.implicits._
    val e = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows === Array((1, 1L), (2, 0L)))
  }
}
