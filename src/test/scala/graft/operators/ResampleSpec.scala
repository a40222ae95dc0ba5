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

  test("locfGrid: chunked fan-out crosses chunk boundaries gap-free (incl. negative slots)") {
    // spans that straddle the 65536-slot generation chunks must come out
    // identical to the naive single-sequence grid: contiguous slots,
    // every boundary slot present exactly once
    for ((s0us, s1us) <- Seq(
        (65530L * Step, 65545L * Step),           // crosses chunk 0 -> 1
        (-5L * Step, 3L * Step),                  // crosses the negative/0 chunk seam
        (-65540L * Step, -65530L * Step))) {      // entirely negative, crosses -2 -> -1
      val df = mk(Seq(("a", s0us, Some(1.0), 1L), ("a", s1us, Some(2.0), 2L)))
      val slots = Resample.locfGrid(df, Seq("k"), "ts", "value", Step)
        .orderBy("slot").collect().map(_.getLong(1)).toSeq
      assert(slots === (s0us / Step to s1us / Step).toSeq,
        s"span [$s0us,$s1us] must be gap-free and duplicate-free")
    }
  }

  test("locfGrid: an oversized per-key span fails fast naming the key, not OOM") {
    val df = mk(Seq(("hot", 0L, Some(1.0), 1L), ("hot", 100L * Step, Some(2.0), 2L)))
    val ex = intercept[Exception] {
      Resample.locfGrid(df, Seq("k"), "ts", "value", Step, maxSlotsPerKey = 50L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(ex).mkString("\n")
    assert(all.contains("locfGrid") && all.contains("hot") && all.contains("101"),
      s"error must name the operator, key, and span; got: $all")
  }

  test("coverageGaps: hand-computed runs; healthy and singleton streams emit nothing") {
    val s = spark; import s.implicits._
    def ts(slot: Long) = new java.sql.Timestamp(slot * 60000L) // 1-min buckets
    // a: slots 0,1,5,6,9 -> gaps [2,4] (3) and [7,8] (2)
    // b: slots 0,1,2     -> no gaps; c: slot 7 alone -> no gaps
    val df = (Seq(0L, 1L, 5L, 6L, 9L).map(("a", _)) ++
      Seq(0L, 1L, 2L).map(("b", _)) ++ Seq(("c", 7L)))
      .map { case (k, sl) => (k, ts(sl)) }.toDF("k", "ts")
    val got = Resample.coverageGaps(df, Seq("k"), "ts", bucketUs = 60000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSet === Set(("a", 2L, 4L, 3L), ("a", 7L, 8L, 2L)),
      s"expected exactly a's two runs, got ${got.toSeq}")
    // duplicate observations within a bucket change nothing
    val dup = Resample.coverageGaps(df.union(df), Seq("k"), "ts", 60000000L)
    assert(dup.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      Seq(("a", 2L), ("a", 7L)))
  }

  test("latenessProfile: hand-computed frontier lateness; in-order stream is all-zero") {
    val s = spark; import s.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key a, arrival order 1..5 with event seconds 100, 50, 200, 199, 300:
    // lateness = 0, 50s, 0, 1s, 0 -> 10s buckets {0: 4 rows, 5: 1 row}
    val rows = Seq(
      ("a", ts(100), 1L), ("a", ts(50), 2L), ("a", ts(200), 3L),
      ("a", ts(199), 4L), ("a", ts(300), 5L),
      ("b", ts(10), 1L), ("b", ts(20), 2L), ("b", ts(30), 3L))
      .toDF("k", "ts", "arr")
    val got = Resample.latenessProfile(rows, Seq("k"), "ts", "arr",
        bucketUs = 10000000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got(("a", 0L)) === ((4L, 0.8, 50000000L)))
    assert(got(("a", 5L)) === ((1L, 0.2, 50000000L)),
      "the 50s-late event lands in bucket 5 and owns the max")
    assert(got(("b", 0L)) === ((3L, 1.0, 0L)), "in-order stream: all zero")
    assert(got.size === 3)
  }
}
