package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The CMS grid as a LIVE streaming aggregation: [[Sketches.cmsSketch]]
  * is a plain (row, bucket) count, so the SAME operator runs unchanged
  * under Structured Streaming (complete-mode aggregation, state =
  * depth·width counters — constant, the streaming-monitor shape), and
  * mergeability means the drained stream's grid is bit-identical to the
  * batch grid over the same events. KMV is deliberately NOT claimed
  * streaming-native: its TopKPerKey heap is a batch physical operator
  * (incremental bottom-k needs keyed state — the batch form re-runs
  * per snapshot instead). */
class StreamingSketchSpec extends SparkSpecBase {

  test("streaming CMS grid == batch grid after the stream drains") {
    val s = spark
    import s.implicits._
    val keys = (1L to 40L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i))
    val (p1, p2) = keys.splitAt(keys.size / 2)

    val ms = MemoryStream[Long](s)
    val grid = Sketches.cmsSketch(ms.toDS().toDF("key"), "key",
      depth = 3, width = 16, salt = "st")
    val q = grid.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      ms.addData(p1: _*); q.processAllAvailable()
      ms.addData(p2: _*); q.processAllAvailable()
      val streamed = s.table("cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.cmsSketch(keys.toDF("key"), "key",
          depth = 3, width = 16, salt = "st")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "drained streaming grid must equal the batch grid")
    } finally q.stop()
  }

  test("streaming grid estimates stay one-sided mid-stream") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[Long](s)
    val grid = Sketches.cmsSketch(ms.toDS().toDF("key"), "key",
      depth = 3, width = 8, salt = "mid")
    val q = grid.writeStream.outputMode("complete")
      .format("memory").queryName("cms_mid").start()
    try {
      // first batch only: estimates over the PREFIX must already be
      // one-sided for the prefix counts (monitors read the grid live)
      ms.addData((1L to 20L).flatMap(i => Seq.fill(2)(i)): _*)
      q.processAllAvailable()
      val sk = s.table("cms_mid")
      val est = Sketches.cmsEstimate((1L to 20L).toDF("key"), sk, "key",
          depth = 3, width = 8, salt = "mid")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (1L to 20L).foreach { i =>
        assert(est(i) >= 2L, s"mid-stream CMS underestimated key $i: ${est(i)}")
      }
    } finally q.stop()
  }

  test("streaming Bloom bit-frame == batch sketch after the stream drains; members probe true") {
    // bloomSketch is, like the CMS grid, a plain fixed-geometry
    // aggregation (distinct occupied bits, ≤ `bits` rows), so the SAME
    // operator runs unchanged as a complete-mode streaming aggregation —
    // the live membership-filter shape; merge-by-OR means the drained
    // frame is bit-identical to the batch sketch over the same keys.
    val s = spark
    import s.implicits._
    val keys = (1L to 80L).toSeq
    val (p1, p2) = keys.splitAt(40)
    val ms = MemoryStream[Long](s)
    val sk = Sketches.bloomSketch(ms.toDS().toDF("key"), "key",
      bits = 512, hashes = 3, salt = "sb")
    val q = sk.writeStream.outputMode("complete")
      .format("memory").queryName("bloom_stream").start()
    try {
      ms.addData(p1: _*); q.processAllAvailable()
      ms.addData(p2: _*); q.processAllAvailable()
      val streamed = s.table("bloom_stream").collect().map(_.getLong(0)).toSet
      val batch = Sketches.bloomSketch(keys.toDF("key"), "key",
          bits = 512, hashes = 3, salt = "sb")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batch,
        "drained streaming bit-frame must equal the batch sketch")
      // and the drained snapshot serves probes like any persisted sketch
      val got = Sketches.bloomContains(keys.toDF("key"),
          s.table("bloom_stream"), "key", 512, 3, "sb")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got.values.forall(identity), "every member must probe true")
    } finally q.stop()
  }

  test("streaming histogram partials == batch histogram after the stream drains") {
    // Quantiles.histogramPartials is, like the CMS grid, a plain
    // fixed-geometry aggregation (state = keys × ≤2^bits counters), so
    // the SAME operator runs unchanged as a complete-mode streaming
    // aggregation — the live-quantile-monitor shape. (The quantile
    // WALK stays batch: it reads the grid snapshot, like cmsEstimate.)
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map(i => (s"g${i % 2}", (i % 37) * 0.5))
    val (p1, p2) = rows.splitAt(100)
    val ms = MemoryStream[(String, Double)](s)
    val hist = graft.operators.Quantiles.histogramPartials(
      ms.toDS().toDF("g", "v"), org.apache.spark.sql.functions.lit(0),
      Seq("g"), "v", loQ = 0L, hiQ = 18000000L, bits = 6)
    val q = hist.writeStream.outputMode("complete")
      .format("memory").queryName("hist_stream").start()
    try {
      ms.addData(p1: _*); q.processAllAvailable()
      ms.addData(p2: _*); q.processAllAvailable()
      val streamed = s.table("hist_stream").collect()
        .map(r => (r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
      val batch = graft.operators.Quantiles.histogramPartials(
          rows.toDF("g", "v"), org.apache.spark.sql.functions.lit(0),
          Seq("g"), "v", loQ = 0L, hiQ = 18000000L, bits = 6)
        .collect().map(r => (r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(streamed === batch,
        "drained streaming histogram must equal the batch histogram")
    } finally q.stop()
  }
}
