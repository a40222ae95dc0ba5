package graft.streaming

import graft.SparkSpecBase
import graft.operators.Trend
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingEwma]] — the live EWMA control chart. THE contract is
  * batch equivalence: the row emitted for bucket t must carry exactly
  * the numbers [[Trend.ewmaChart]] reports over the key's series
  * truncated at t. Asserted per-bucket on the pure transition with
  * random waves, and end-to-end through MemoryStream. */
class StreamingEwmaSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s buckets

  /** Batch chart over the series truncated at `upTo` (present buckets
    * only, the shared contract). */
  private def batchAt(series: Seq[(Long, Double)], upTo: Long) = {
    val s = spark
    import s.implicits._
    val df = series.filter(_._1 <= upTo).toDF("t", "v")
      .withColumn("k", lit("k"))
    Trend.ewmaChart(df, Seq("k"), "t", "v", window = 4, minPriors = 3,
      valueQuantDecimals = 2).collect().head
  }

  test("every emitted bucket equals the batch chart truncated there") {
    val rnd = new scala.util.Random(31)
    val slots = (0L to 9L).filter(_ => rnd.nextDouble() < 0.8) :+ 10L
    val series = slots.map(sl => sl -> (50.0 + rnd.nextInt(2000) / 100.0))
    val ticks = series.map { case (sl, v) =>
      EwmaTick("k", sl * Bucket + 1L, v) }
    var state = EwmaState(Vector.empty, Map.empty)
    var rows = Vector.empty[EwmaAlertRow]
    ticks.foreach { t =>
      val (out, next) = StreamingEwma.step(state, Seq(t), Bucket,
        wmUs = t.tsUs, window = 4, limit = 3.0, minPriors = 3,
        quantDecimals = 2)
      rows ++= out; state = next
    }
    val (tail, _) = StreamingEwma.step(state, Seq.empty, Bucket,
      Long.MaxValue / 2, 4, 3.0, 3, 2)
    rows ++= tail
    assert(rows.map(_.slot) === series.map(_._1),
      "one final row per present bucket, in slot order")
    rows.foreach { r =>
      val b = batchAt(series, r.slot)
      assert(r.xLast === b.getAs[Double]("x_last"), s"x_last @${r.slot}")
      assert(r.nPrior.toLong === b.getAs[Long]("n_prior"), s"n_prior @${r.slot}")
      def opt(name: String): Option[Any] =
        if (b.isNullAt(b.fieldIndex(name))) None
        else Some(b.get(b.fieldIndex(name)))
      assert(r.ewma === opt("ewma"), s"ewma @${r.slot}")
      assert(r.sdPrior === opt("sd_prior"), s"sd @${r.slot}")
      assert(r.z === opt("z"), s"z @${r.slot}")
      assert(r.flagged === opt("flagged"), s"flagged @${r.slot}")
    }
  }

  test("step: ticks sum into buckets; frontier-late ticks drop; jump flags") {
    // four quiet buckets then a 4x jump: the jump bucket must flag
    val quiet = (0L to 3L).map(sl => EwmaTick("k", sl * Bucket, 10.0))
    val jump = EwmaTick("k", 4 * Bucket, 40.0)
    var state = EwmaState(Vector.empty, Map.empty)
    var rows = Vector.empty[EwmaAlertRow]
    (quiet :+ jump).foreach { t =>
      val (out, next) = StreamingEwma.step(state, Seq(t), Bucket, t.tsUs,
        8, 3.0, 2, 2)
      rows ++= out; state = next
    }
    val (tail, _) =
      StreamingEwma.step(state, Seq.empty, Bucket, Long.MaxValue / 2, 8, 3.0, 2, 2)
    rows ++= tail
    assert(rows.last.slot === 4L)
    // constant history has sd 0 -> z NULL; give it variance instead
    var st2 = EwmaState(Vector.empty, Map.empty)
    var rs2 = Vector.empty[EwmaAlertRow]
    val wavy = Seq(10.0, 12.0, 9.0, 11.0, 40.0).zipWithIndex.map {
      case (v, i) => EwmaTick("k", i * Bucket, v) }
    wavy.foreach { t =>
      val (out, next) = StreamingEwma.step(st2, Seq(t), Bucket, t.tsUs,
        8, 3.0, 2, 2)
      rs2 ++= out; st2 = next
    }
    val (t2, st2d) =
      StreamingEwma.step(st2, Seq.empty, Bucket, Long.MaxValue / 2, 8, 3.0, 2, 2)
    rs2 ++= t2
    assert(rs2.last.flagged === Some(true), s"jump must flag: ${rs2.last}")
    // a tick at/below the finalized frontier is dropped, not re-opened
    val (out3, st3) = StreamingEwma.step(st2d,
      Seq(EwmaTick("k", 0L, 99.0)), Bucket, Long.MaxValue / 2, 8, 3.0, 2, 2)
    assert(out3.isEmpty && st3.open.isEmpty, "watermark-late tick ignored")
  }

  test("end-to-end: MemoryStream emissions equal the batch chart per bucket") {
    val s = spark
    import s.implicits._
    val series = Seq(0L -> 10.0, 1L -> 12.0, 2L -> 9.0, 3L -> 11.0,
      5L -> 30.0)
    val ticks = series.map { case (sl, v) =>
      EwmaTick("a", sl * Bucket + 500L, v) }
    val ms = MemoryStream[EwmaTick](s)
    val q = StreamingEwma(ms.toDS(), Bucket, watermarkDelay = "0 seconds",
        window = 4, minPriors = 3, quantDecimals = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_e2e").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(EwmaTick("zz", 100 * Bucket, 1.0)); q.processAllAvailable()
      val got = s.table("ewma_e2e").where(col("key") === "a")
        .orderBy("slot").collect()
      assert(got.map(_.getAs[Long]("slot")).toSeq === series.map(_._1))
      val last = got.last
      val b = batchAt(series, 5L)
      assert(last.getAs[Double]("z") === b.getAs[Double]("z"))
      assert(last.getAs[Boolean]("flagged") === b.getAs[Boolean]("flagged"))
      assert(last.getAs[Boolean]("flagged"), "the 3x jump flags live")
    } finally q.stop()
  }
}
