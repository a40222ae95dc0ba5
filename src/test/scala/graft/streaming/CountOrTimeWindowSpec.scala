package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** W1 exact semantics (SURVEY.md §7.5): per-key windows close at
  * maxBatchSize elements OR windowMs elapsed, whichever first; no loss,
  * no dup, batch sizes in [1, max]. */
class CountOrTimeWindowSpec extends SparkSpecBase {

  test("count-closure emits full chunks immediately; time-closure flushes the tail") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[String](s)
    val out = CountOrTimeWindow(ms.toDS(), (v: String) => v.substring(0, 1),
      maxBatchSize = 3, windowMs = 700)

    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cot_spec").trigger(Trigger.ProcessingTime(100)).start()
    try {
      ms.addData("a1", "a2", "a3", "a4", "b1")
      // NOTE: no processAllAvailable here — with ProcessingTimeTimeout the
      // engine schedules batches continuously to evaluate timeouts, so
      // "all available" never settles; poll the sink with a deadline.
      val deadline = System.currentTimeMillis() + 30000
      def rowsNow() = s.table("cot_spec").collect()
      var rows = rowsNow()
      while (rows.filter(_.getString(2) == "count").isEmpty &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200); rows = rowsNow()
      }
      // count axis: a1..a3 closed on arrival; a4/b1 still buffered
      val countBatches = rows.filter(_.getString(2) == "count")
      assert(countBatches.length === 1)
      assert(countBatches.head.getString(0) === "a")
      assert(countBatches.head.getSeq[String](1) === Seq("a1", "a2", "a3"))

      // time axis: within windowMs + trigger slack both tails flush
      while (rows.map(_.getSeq[String](1).size).sum < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = rowsNow()
      }
      val timeBatches = rows.filter(_.getString(2) == "time")
      assert(timeBatches.map(r => r.getString(0) -> r.getSeq[String](1)).toSet ===
        Set("a" -> Seq("a4"), "b" -> Seq("b1")))
      // lossless + no dup + bounds
      val all = rows.flatMap(_.getSeq[String](1))
      assert(all.sorted.toSeq === Seq("a1", "a2", "a3", "a4", "b1"))
      assert(rows.forall { r => val n = r.getSeq[String](1).size; n >= 1 && n <= 3 })
    } finally q.stop()
  }

  test("T7: buffered state survives checkpoint stop + restart — no loss, no dup") {
    val s = spark
    import s.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cot_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cot_out").toString
    val ms = MemoryStream[String](s)
    val out = CountOrTimeWindow(ms.toDS(), (v: String) => v.substring(0, 1),
      maxBatchSize = 3, windowMs = 3000)
    def start() = out.writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(100)).start()

    def sinkRows() =
      try s.read.parquet(outDir).collect()
      catch { case _: Exception => Array.empty[org.apache.spark.sql.Row] }

    // phase 1: a partial buffer [a1, a2] lands in state, nothing emitted
    val q1 = start()
    ms.addData("a1", "a2")
    val d1 = System.currentTimeMillis() + 10000
    // wait until the batch is committed into state (sink stays empty —
    // the window is still open at this point)
    while (q1.recentProgress.map(_.numInputRows).sum < 2 &&
        System.currentTimeMillis() < d1) Thread.sleep(100)
    q1.stop()

    // phase 2: arrivals while the query is down, then restart from ckpt
    ms.addData("a3", "a4")
    val q2 = start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var rows = sinkRows()
      while (rows.flatMap(_.getSeq[String](1)).length < 4 &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200); rows = sinkRows()
      }
      val all = rows.flatMap(_.getSeq[String](1))
      assert(all.sorted.toSeq === Seq("a1", "a2", "a3", "a4"),
        "pre-restart buffer recovered, offline arrivals replayed exactly once")
      assert(rows.forall { r => val n = r.getSeq[String](1).size; n >= 1 && n <= 3 },
        "batch bounds hold across the restart boundary")
    } finally q2.stop()
  }
}
