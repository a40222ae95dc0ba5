package graft.streaming

import graft.SparkSpecBase
import graft.operators.Changes
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `distinctUntilChanged` semantics, batch and streaming:
  *  - only CONSECUTIVE repeats drop (a recurring value is kept again);
  *  - comparison is null-safe (a run of NULLs is one run);
  *  - the streaming form carries the last emitted value per key in state,
  *    so a run spanning micro-batch boundaries is still one run and must
  *    reproduce the batch run exactly.
  */
// top-level: Spark cannot encode a case class nested inside a test class
case class DucEvt(user: Long, seq: Long, kind: String)

class DistinctUntilChangedSpec extends SparkSpecBase {
  private type Evt = DucEvt
  private def Evt(user: Long, seq: Long, kind: String) = DucEvt(user, seq, kind)

  private val evts = Seq(
    // user 1: a,a,b,b,b,a  -> transitions at seq 0,2,5 (a recurs and is kept)
    Evt(1L, 0L, "a"), Evt(1L, 1L, "a"), Evt(1L, 2L, "b"),
    Evt(1L, 3L, "b"), Evt(1L, 4L, "b"), Evt(1L, 5L, "a"),
    // user 2: null,null,c,null -> transitions at seq 0,2,3 (null run is ONE run)
    Evt(2L, 0L, null), Evt(2L, 1L, null), Evt(2L, 2L, "c"), Evt(2L, 3L, null),
    // user 3: single row survives
    Evt(3L, 0L, "z"))

  private val expected = Set((1L, 0L), (1L, 2L), (1L, 5L), (2L, 0L), (2L, 2L), (2L, 3L), (3L, 0L))

  test("batch: keeps run heads only, null-safe, per key") {
    val s = spark
    import s.implicits._
    val got = Changes.distinctUntilChanged(
        evts.toDF("user", "seq", "kind"),
        keyCols = Seq(col("user")),
        orderCols = Seq(col("seq")),
        valueCols = Seq(col("kind")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("batch: plan is one window over the key exchange — no self-join, no collect_list") {
    val s = spark
    import s.implicits._
    val plan = Changes.distinctUntilChanged(
        evts.toDF("user", "seq", "kind"),
        Seq(col("user")), Seq(col("seq")), Seq(col("kind")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window plan")
    assert(!plan.contains("Join"), "distinctUntilChanged must not plan a join")
  }

  test("streaming: state spans micro-batches; result equals the batch run") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[Evt](s)
    val out = Changes.distinctUntilChangedStream(ms.toDS())(
      key = _.user, order = _.seq, value = e => Option(e.kind))
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("duc_stream")
      .start()
    try {
      // split MID-RUN: user 1's b-run and user 2's trailing null arrive in a
      // later batch than the run head — only cross-batch state dedups them
      ms.addData(evts.take(4))
      q.processAllAvailable()
      ms.addData(evts.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("duc_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      "streaming transitions must be identical to the batch operator's")
  }

  test("q85 on the fixture: operator output matches the oracle lag-filter re-expression") {
    val s = spark
    val e = graft.core.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val got = Changes.distinctUntilChanged(
        e, Seq(col("user_id")), Seq(col("ts"), col("event_id")), Seq(col("event_type")))
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent spark-sql re-expression of the same semantics
    e.createOrReplaceTempView("duc_events")
    val want = s.sql(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |         event_type
        |  FROM duc_events)
        |WHERE NOT (prev <=> event_type)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < e.count(),
      "fixture must exercise both kept and dropped rows")
  }
}
