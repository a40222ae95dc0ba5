package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

class StreamingFunnelSpec extends SparkSpecBase {

  private val stages = IndexedSeq("view", "click", "purchase")

  test("step: pure transition mirrors the batch greedy chain, disorder within batch absorbed") {
    // out-of-order within the batch: sorted fold takes view@10 then
    // click@20 then purchase@30
    val (r1, t1) = StreamingFunnel.step(stages, None,
      Seq(("purchase", 30L), ("view", 10L), ("click", 20L)))
    assert((r1, t1) === ((3, 30L)))
    // strictly-after: click at the same ts as the view does not chain
    assert(StreamingFunnel.step(stages, None,
      Seq(("view", 10L), ("click", 10L)))._1 === 1)
    // state carries across calls: second batch continues from lastT
    val s1 = StreamingFunnel.step(stages, None, Seq(("view", 10L)))
    val s2 = StreamingFunnel.step(stages, Some(s1), Seq(("click", 15L), ("purchase", 40L)))
    assert(s2 === ((3, 40L)))
    // a stage event arriving before the anchor is ignored (no rewind)
    val s3 = StreamingFunnel.step(stages, Some(s1), Seq(("click", 5L)))
    assert(s3 === s1)
  }

  test("streaming progress over ordered batches equals the batch funnel per stage") {
    val s = spark
    import s.implicits._
    val b1 = Seq(
      FunnelEvent(1L, "view", 10L), FunnelEvent(1L, "click", 20L),
      FunnelEvent(2L, "click", 5L), FunnelEvent(2L, "view", 10L),
      FunnelEvent(3L, "view", 10L))
    val b2 = Seq(
      FunnelEvent(1L, "purchase", 30L),
      FunnelEvent(2L, "click", 12L),
      FunnelEvent(3L, "error", 15L))
    val ms = MemoryStream[FunnelEvent](s)
    val latest = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    val q = StreamingFunnel(ms.toDS(), stages, idleTimeoutMs = None)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
        batch.collect().foreach(p => latest.put(p.user, p.reached))
        ()
      }
      .start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch reference over the union
    val counts = graft.operators.Funnel.funnelCounts(
        (b1 ++ b2).map(e => (e.user, e.etype, e.ts)).toDF("user_id", "event_type", "uts"),
        stages)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val got = latest.asScala
    // u1 completes all 3; u2 reaches view>click (click@12 after view@10);
    // u3 views only
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1).map(identity))
    (1 to stages.size).foreach { i =>
      assert(got.values.count(_ >= i).toLong === counts(i),
        s"stage $i streaming-vs-batch count")
    }
  }

  test("idle timeout evicts state: a returning user restarts from stage 0") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[FunnelEvent](s)
    val latest = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    // NO processAllAvailable anywhere here: with ProcessingTimeTimeout the
    // engine schedules batches continuously to evaluate timeouts, so that
    // call never returns (the CountOrTimeWindowSpec lesson) — poll the
    // sink with a deadline instead
    val q = StreamingFunnel(ms.toDS(), stages, idleTimeoutMs = Some(1L))
      .writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
        batch.collect().foreach(p => latest.put(p.user, p.reached))
        ()
      }
      .start()
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    try {
      ms.addData(FunnelEvent(1L, "view", 10L), FunnelEvent(1L, "click", 20L))
      await(latest.get(1L) == 2, "user 1 to reach stage 2")
      Thread.sleep(300) // let the 1 ms idle deadline pass and fire
      // a later batch sees user 1 as BRAND NEW: purchase alone cannot
      // advance a restarted funnel past stage 0
      ms.addData(FunnelEvent(1L, "purchase", 30L))
      await(latest.get(1L) == 0, "evicted user 1 to restart from stage 0")
    } finally q.stop()
  }

  test("update stream emits only on progress (and on first observation)") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[FunnelEvent](s)
    val emitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = StreamingFunnel(ms.toDS(), stages, idleTimeoutMs = None)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
        emitted.addAndGet(batch.collect().length)
        ()
      }
      .start()
    try {
      ms.addData(FunnelEvent(1L, "view", 10L)); q.processAllAvailable()
      val afterFirst = emitted.get()
      // no-progress batch: wrong stage, and a stale click before lastT
      ms.addData(FunnelEvent(1L, "error", 20L), FunnelEvent(1L, "click", 5L))
      q.processAllAvailable()
      val afterNoop = emitted.get()
      ms.addData(FunnelEvent(1L, "click", 30L)); q.processAllAvailable()
      assert(afterFirst === 1, "first observation emits")
      assert(afterNoop === afterFirst, "no-progress batch is silent")
      assert(emitted.get() === afterNoop + 1, "progress emits exactly once")
    } finally q.stop()
  }
}
