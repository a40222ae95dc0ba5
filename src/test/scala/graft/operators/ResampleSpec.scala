package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Resample.locfGrid]] — the gap-fill decision rules on hand fixtures:
  * forward fill across gaps, null ticks open slots without carrying
  * values, within-slot last-pick total order, grid = exactly each key's
  * observed span. */
class ResampleSpec extends SparkSpecBase {

  private val Step = 1000000L // 1s slots

  private def mk(rows: Seq[(String, Long, Option[Double], Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "us", "v", "seq")
      .select(col("k"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("v").as("value"), col("seq"))
  }

  test("locfGrid: gaps fill forward; null ticks open slots but carry no value") {
    val df = mk(Seq(
      ("a", 100000L, Some(1.0), 1L),       // slot 0
      ("a", 3100000L, Some(2.0), 2L),      // slot 3 -> gap slots 1,2 fill 1.0
      ("b", 5000000L, None, 3L),           // slot 5: tick, no value
      ("b", 6000000L, Some(7.0), 4L)))     // slot 6
    val out = Resample.locfGrid(df, Seq("k"), "ts", "value", Step)
      .orderBy("k", "slot").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq === Seq(
      ("a", 0L, 1L, Some(1.0)), ("a", 1L, 0L, Some(1.0)),
      ("a", 2L, 0L, Some(1.0)), ("a", 3L, 1L, Some(2.0)),
      ("b", 5L, 1L, None), ("b", 6L, 1L, Some(7.0))))
  }

  test("locfGrid: within-slot last pick follows the order columns, ties broken explicitly") {
    val df = mk(Seq(
      ("a", 100000L, Some(1.0), 1L),
      ("a", 900000L, Some(9.0), 2L),   // same slot, later ts -> wins
      ("b", 500000L, Some(3.0), 1L),
      ("b", 500000L, Some(4.0), 2L)))  // identical ts -> seq breaks the tie
    val out = Resample.locfGrid(df, Seq("k"), "ts", "value", Step,
        orderCols = Seq(col("ts"), col("seq")))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out === Map("a" -> 9.0, "b" -> 4.0))
  }

  test("locfGrid: a trailing null tick never shadows a real observation in its slot") {
    val df = mk(Seq(
      ("a", 100000L, Some(5.0), 1L),   // real observation
      ("a", 900000L, None, 2L)))       // later null tick, same slot
    val r = Resample.locfGrid(df, Seq("k"), "ts", "value", Step,
      orderCols = Seq(col("ts"), col("seq"))).collect().head
    assert(r.getLong(3) === 2L, "both ticks counted")
    assert(r.getDouble(4) === 5.0, "slot value is the last NON-NULL observation")
  }

  test("locfGrid: pre-epoch timestamps land in negative slots (floor division)") {
    val df = mk(Seq(
      ("a", -100000L, Some(1.0), 1L),  // 0.1s before epoch -> slot -1
      ("a", 100000L, Some(2.0), 2L)))  // slot 0
    val out = Resample.locfGrid(df, Seq("k"), "ts", "value", Step)
      .orderBy("slot").collect().map(r => (r.getLong(1), r.getDouble(4)))
    assert(out.toSeq === Seq((-1L, 1.0), (0L, 2.0)),
      "truncation would fold both into a double-width slot 0")
  }

  test("locfGrid: slot_start renders the slot boundary; n_obs counts all ticks") {
    val df = mk(Seq(("a", 2500000L, Some(1.0), 1L), ("a", 2900000L, Some(2.0), 2L)))
    val r = Resample.locfGrid(df, Seq("k"), "ts", "value", Step,
      orderCols = Seq(col("ts"), col("seq"))).collect().head
    assert(r.getLong(1) === 2L && r.getLong(3) === 2L && r.getDouble(4) === 2.0)
    assert(r.getAs[java.time.LocalDateTime](2).getSecond === 2)
  }
}
