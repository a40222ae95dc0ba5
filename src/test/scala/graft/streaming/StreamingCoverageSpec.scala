package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingCoverage]] — the live gap monitor. THE contract is batch
  * equivalence: once the watermark passes every observed bucket, the
  * emitted gap runs must equal
  * [[graft.operators.Resample.coverageGaps]] over the same ticks.
  * Asserted on the pure transition with random waves, and end-to-end
  * through MemoryStream + event-time timers. */
class StreamingCoverageSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s buckets

  /** Sequential reference: the batch ledger for one key. */
  private def reference(slots: Seq[Long]): Seq[(Long, Long, Long)] = {
    val obs = slots.distinct.sorted
    obs.zip(obs.drop(1)).collect {
      case (p, c) if c > p + 1 => (p + 1, c - 1, c - p - 1)
    }
  }

  test("step: drained emissions equal the batch ledger on random waves") {
    val rnd = new scala.util.Random(23)
    (1 to 60).foreach { trial =>
      val slots = (1 to 1 + rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
      val ticks = slots.map(sl =>
        CoverageTick("k", sl * Bucket + rnd.nextInt(1000000)))
      val ordered = ticks.sortBy(_.tsUs)
      val lagUs = rnd.nextInt(3) * Bucket
      var state = CoverageState(None, Set.empty)
      var rows = Vector.empty[CoverageGapRow]
      var delivered = 0
      while (delivered < ordered.size) {
        val n = 1 + rnd.nextInt(5)
        val wave = ordered.slice(delivered, delivered + n)
        delivered += wave.size
        val wm = wave.map(_.tsUs).max - lagUs
        val (out, next) = StreamingCoverage.step(state, wave, Bucket, wm)
        rows ++= out
        state = next
      }
      val (tail, _) =
        StreamingCoverage.step(state, Seq.empty, Bucket, Long.MaxValue / 2)
      rows ++= tail
      val got = rows.map(r => (r.gapStartSlot, r.gapEndSlot, r.nMissing))
      assert(got === reference(slots).toVector, s"trial $trial (slots $slots)")
    }
  }

  test("a gap emits only once its closing bucket is watermark-final") {
    // observation at bucket 0, then bucket 5: the [1,4] gap must NOT
    // emit while bucket 5 is still open (a late tick could fill it)
    var state = CoverageState(None, Set.empty)
    val (r1, s1) = StreamingCoverage.step(state,
      Seq(CoverageTick("k", 100L)), Bucket, 0L)
    assert(r1.isEmpty)
    val (r2, s2) = StreamingCoverage.step(s1,
      Seq(CoverageTick("k", 5 * Bucket + 100L)), Bucket, 5 * Bucket + 100L)
    assert(r2.isEmpty, "bucket 5 not closed yet: the hole is still fillable")
    // a late tick INSIDE the hole arrives before finalization: no gap
    val (r3, s3) = StreamingCoverage.step(s2,
      Seq(CoverageTick("k", 3 * Bucket)), Bucket, 6 * Bucket)
    assert(r3.map(r => (r.gapStartSlot, r.gapEndSlot, r.nMissing)) ===
      Seq((1L, 2L, 2L), (4L, 4L, 1L)),
      "the late tick splits the would-be [1,4] gap into two real ones")
    assert(s3.lastFinal === Some(5L) && s3.pending.isEmpty)
  }

  test("end-to-end: MemoryStream emissions equal the batch operator's ledger") {
    val s = spark
    import s.implicits._
    val ticks = Seq(0L, 1L, 5L, 6L, 9L).map(sl =>
      CoverageTick("a", sl * Bucket + 500L))
    val ms = MemoryStream[CoverageTick](s)
    val q = StreamingCoverage(ms.toDS(), Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("cov_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      // sentinel key advances the watermark past everything
      ms.addData(CoverageTick("zz", 100 * Bucket)); q.processAllAvailable()
      val got = s.table("cov_e2e").where(col("key") === "a").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      // batch twin over the same ticks
      val batch = graft.operators.Resample.coverageGaps(
          ticks.map(t => ("a", new java.sql.Timestamp(t.tsUs / 1000L)))
            .toDF("k", "ts"), Seq("k"), "ts", Bucket)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).sortBy(_._1)
      assert(got.toSeq === batch.toSeq,
        s"stream ledger ${got.toSeq} must equal batch ledger ${batch.toSeq}")
      assert(got.toSeq === Seq((2L, 4L, 3L), (7L, 8L, 2L)))
    } finally q.stop()
  }
}
