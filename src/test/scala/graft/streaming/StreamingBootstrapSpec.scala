package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingBootstrap]] — the live per-window Poisson-bootstrap CI.
  * THE contract is batch equivalence: drained rows must equal
  * [[Sampling.poissonBootstrapMean]] over each (key, slot) slice of the
  * same ticks (shared avalanche weights + exact integer sums — an
  * identity, not an approximation claim). */
class StreamingBootstrapSpec extends SparkSpecBase {

  private val Bucket = 1000000L

  test("step: accumulators merge; watermark finalizes; guards fail loud") {
    val t = (slot: Long, id: String, x: Long) =>
      BootTick("k", slot * Bucket + 9L, id, x)
    val s0 = BootState(None, Map.empty)
    val ticks = (1 to 40).map(i => t(0, s"d$i", (i % 5) * 100L)) :+ t(1, "z", 7L)
    val (r1, s1) = StreamingBootstrap.step(s0, ticks, Bucket, 0L, 16, "sp", 5)
    assert(r1.isEmpty && s1.open.keySet === Set(0L, 1L))
    // the accumulator IS the sufficient statistic: 2B+2 longs
    assert(s1.open(0L).n === 40L && s1.open(0L).swx.size === 16)
    // incremental fold order-insensitive: one-shot == two micro-batches
    val (h1, h2) = ticks.splitAt(17)
    val (_, sA) = StreamingBootstrap.step(s0, h1, Bucket, 0L, 16, "sp", 5)
    val (_, sB) = StreamingBootstrap.step(sA, h2, Bucket, 0L, 16, "sp", 5)
    assert(sB.open(0L) === s1.open(0L), "micro-batch folding is a plain sum")
    val (r2, s2) = StreamingBootstrap.step(s1, Seq.empty, Bucket, 1 * Bucket, 16, "sp", 5)
    assert(r2.map(_.slot) === Seq(0L) && s2.doneSlot === Some(0L))
    val row = r2.head
    assert(row.n === 40L && row.b_used === 16L)
    assert(row.boot_lo.get <= row.mean && row.mean <= row.boot_hi.get)
    // late tick for a finalized slot drops
    val (r3, s3) = StreamingBootstrap.step(s2, Seq(t(0, "late", 1L)),
      Bucket, 1 * Bucket, 16, "sp", 5)
    assert(r3.isEmpty && !s3.open.contains(0L))
    // micro-score bound fails loud
    val over = intercept[IllegalArgumentException] {
      StreamingBootstrap.step(s0, Seq(t(2, "big", 1000001L)), Bucket, 0L, 16, "sp", 5)
    }
    assert(over.getMessage.contains("micro-score"))
  }

  test("end-to-end: drained MemoryStream rows equal batch poissonBootstrapMean per (key, slot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    val ticks = (1 to 500).map { i =>
      val slot = rnd.nextInt(3).toLong
      val key = if (rnd.nextBoolean()) "a" else "b"
      BootTick(key, slot * Bucket + rnd.nextInt(1000000).toLong,
        s"id$i", rnd.nextInt(5000).toLong)
    }
    val ms = MemoryStream[BootTick](s)
    val q = StreamingBootstrap(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
      replicates = 32, salt = "sp")
      .writeStream.outputMode("append").format("memory")
      .queryName("boot_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(BootTick("zz", 100 * Bucket, "w", 0L)); q.processAllAvailable()
      val got = s.table("boot_e2e").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
      assert(got.nonEmpty && got.keySet.map(_._1) === Set("a", "b"))
      got.keys.foreach { case (k, slot) =>
        val slice = ticks.filter(t =>
          t.key == k && Math.floorDiv(t.tsUs, Bucket) == slot)
        val b = Sampling.poissonBootstrapMean(
            slice.map(t => (t.id, t.x)).toDF("id", "x"), "id", "x",
            replicates = 32, salt = "sp")
          .collect().head
        assert(got((k, slot)) === ((b.getLong(0), b.getLong(1), b.getDouble(2),
          b.getDouble(3), b.getDouble(4), b.getDouble(5))),
          s"batch equivalence for ($k, $slot)")
      }
    } finally q.stop()
  }
}
