package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-SEGMENT live monitoring (the r16 verdict item 6): the batch tier
  * has per-segment AUC/KS/BH (q237/q245/q246), and the streaming twins
  * reach the same segmentation MECHANICALLY — key = "gate|segment".
  * This spec pins that down as a contract:
  *
  *  1. a segmented-key StreamingAuc drains rows equal to
  *     [[Quality.rocAucBy]] over the same slot's ticks, segment for
  *     segment (and ECE equal to the per-slice calibrationCurve);
  *  2. a segmented-key StreamingKs feeds the documented ALARM
  *     DISCIPLINE — Smirnov tail p per drained window row, then
  *     [[Quality.bhFdr]] across the slot's segments — and the rejected
  *     set equals the batch ksTestBy → bhFdr path exactly, so "which
  *     segments drifted this hour, FDR-controlled" is the same answer
  *     live and offline. */
class StreamingSegmentSpec extends SparkSpecBase {

  private val Bucket = 1000000L // 1s windows
  private val Segs = Seq("web", "book", "code", "wiki")

  test("per-segment StreamingAuc (key = gate|segment) equals rocAucBy per slot") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val ticks = (1 to 800).map { _ =>
      val seg = Segs(rnd.nextInt(Segs.length))
      val slot = rnd.nextInt(2).toLong
      val score = rnd.nextInt(21).toLong * 50000L
      val label = rnd.nextInt(1000000) < (150000 + score / 2 + seg.length * 40000)
      AucTick(s"en|$seg", slot * Bucket + rnd.nextInt(1000000).toLong, score, label)
    }
    val ms = MemoryStream[AucTick](s)
    val q = StreamingAuc(ms.toDS(), Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("seg_auc").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(AucTick("zz", 100 * Bucket, 0L, false)); q.processAllAvailable()
      val drained = s.table("seg_auc").where(col("key") =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getDouble(6)),
            if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
      assert(drained.keySet.map(_._1).map(_.split('|')(1)).toSet === Segs.toSet)
      Seq(0L, 1L).foreach { slot =>
        val slice = ticks.filter(t => Math.floorDiv(t.tsUs, Bucket) == slot)
        val df = slice.map(t => (t.key.split('|')(1), t.score, t.label))
          .toDF("segment", "score", "y")
        val batch = Quality.rocAucBy(df, "segment", "score", "y").collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
        batch.foreach { case (seg, (n, np, nn, u2, auc)) =>
          val (sn, snp, snn, su2, sauc, sece) = drained((s"en|$seg", slot))
          assert((sn, snp, snn, su2, sauc) === ((n, np, nn, u2, auc)),
            s"segment $seg slot $slot: streaming != rocAucBy")
          // ECE: the per-slice calibrationCurve aggregate, like the
          // unsegmented contract — the segment key changes NOTHING
          val bEce = Quality.calibrationCurve(
              df.where(col("segment") === seg), "score", "y")
            .select(col("ece")).limit(1).collect().headOption.map(_.getDouble(0))
          assert(sece === bEce, s"segment $seg slot $slot: ece mismatch")
        }
        assert(batch.keySet === drained.keySet.collect {
          case (k, sl) if sl == slot => k.split('|')(1) })
      }
    } finally q.stop()
  }

  test("per-segment StreamingKs -> Smirnov p -> bhFdr equals the batch " +
    "ksTestBy -> bhFdr alarm path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val slot = 0L
    val ticks = (1 to 1200).map { _ =>
      val seg = Segs(rnd.nextInt(Segs.length))
      val side = rnd.nextBoolean()
      // 'code' genuinely drifts between sides; others share a distribution
      val shift = if (seg == "code" && side) 7L else 0L
      val value = rnd.nextInt(12).toLong + shift
      KsTick(s"en|$seg", slot * Bucket + rnd.nextInt(1000000).toLong, value, side)
    }
    val ms = MemoryStream[KsTick](s)
    val q = StreamingKs(ms.toDS(), Bucket, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("seg_ks").start()
    try {
      ms.addData(ticks: _*); q.processAllAvailable()
      ms.addData(KsTick("zz", 100 * Bucket, 0L, side = false)); q.processAllAvailable()
      val drained = s.table("seg_ks").where(col("key") =!= "zz")
        .select(split(col("key"), "\\|").getItem(1).as("segment"),
          col("n1"), col("n2"), col("d_num"), col("d"), col("crit"), col("drifted"))
      // the alarm discipline: Smirnov tail p PER DRAINED WINDOW ROW
      // (the ksTestBy p_micro formula over the row's own exact integer
      // sufficient statistic), then BH across the slot's segments
      val dd = col("d_num").cast("double")
      val pMicro = least(lit(1000000L),
        round(lit(2.0) * exp(lit(-2.0) * ((dd * dd) /
          (col("n1").cast("double") * col("n2").cast("double") *
            (col("n1") + col("n2")).cast("double")))) * lit(1000000.0))
          .cast("long"))
      val liveAlarms = Quality.bhFdr(
          drained.select(col("segment"), pMicro.as("p_micro")),
          "segment", "p_micro")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(_._1)
      // the batch path over the same ticks
      val df = ticks.map(t => (t.key.split('|')(1), t.value, t.side))
        .toDF("segment", "v", "side")
      val ksB = Quality.ksTestBy(df, "segment", "v", "side")
      val batchAlarms = Quality.bhFdr(
          ksB.select(col("segment"), col("p_micro")), "segment", "p_micro")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(_._1)
      assert(liveAlarms.toSeq === batchAlarms.toSeq)
      // the planted drift is the rejected segment; a same-distribution
      // segment is not (the alarm is informative, not vacuous)
      val rejected = liveAlarms.filter(_._5).map(_._1).toSet
      assert(rejected.contains("code"), s"planted drift not flagged: $rejected")
      // and the streaming rows themselves equal ksTestBy field-for-field
      val got = drained.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getBoolean(6)))).toMap
      val want = ksB.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getBoolean(6)))).toMap
      assert(got === want)
    } finally q.stop()
  }
}
