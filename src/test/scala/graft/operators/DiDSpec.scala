package graft.operators

import graft.SparkSpecBase

/** Difference-in-differences contracts: the hand-computed textbook
  * readout, the level-shift invariance that IS the design's point,
  * and the thin-arm / zero-variation guards. */
class DiDSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  // (unit, treat, post, value)
  private val panel = Seq(
    (1L, true, false, 10.0), (1L, true, true, 20.0),
    (2L, true, false, 0.0), (2L, true, true, 14.0),
    (11L, false, false, 5.0), (11L, false, true, 6.0),
    (12L, false, false, 7.0), (12L, false, true, 10.0))

  test("hand-computed readout: delta, Welch se, z, cell means") {
    val out = Experiment.diffInDiff(
      panel.toDF("unit", "treat", "post", "value"),
      "unit", "treat", "post", "value").collect().head
    assert(out.getAs[Long]("n_treat") === 2L && out.getAs[Long]("n_ctrl") === 2L)
    // d_T = (10, 14) -> mean 12, var 8; d_C = (1, 3) -> mean 2, var 2
    assert(out.getAs[Double]("delta") === 10.0)
    assert(math.abs(out.getAs[Double]("se") - math.sqrt(5.0)) < 1e-6)
    assert(math.abs(out.getAs[Double]("z") - 10.0 / math.sqrt(5.0)) < 1e-6)
    assert(out.getAs[Boolean]("significant"))
    assert(out.getAs[Double]("mean_pre_treat") === 5.0)
    assert(out.getAs[Double]("mean_post_treat") === 17.0)
    assert(out.getAs[Double]("mean_pre_ctrl") === 6.0)
    assert(out.getAs[Double]("mean_post_ctrl") === 8.0)
  }

  test("time-constant unit levels cancel: shifting every treated unit's BOTH " +
    "periods leaves delta/se/z unchanged (the design's identification point)") {
    val shifted = panel.map { case (u, t, p, v) =>
      (u, t, p, if (t) v + 1000.0 else v)
    }
    val a = Experiment.diffInDiff(panel.toDF("unit", "treat", "post", "value"),
      "unit", "treat", "post", "value").collect().head
    val b = Experiment.diffInDiff(shifted.toDF("unit", "treat", "post", "value"),
      "unit", "treat", "post", "value").collect().head
    assert(a.getAs[Double]("delta") === b.getAs[Double]("delta"))
    assert(a.getAs[Double]("se") === b.getAs[Double]("se"))
    assert(a.getAs[Double]("z") === b.getAs[Double]("z"))
    // while the naive post-period comparison would move by the shift
    assert(b.getAs[Double]("mean_post_treat") -
      a.getAs[Double]("mean_post_treat") === 1000.0)
  }

  test("guards: thin arm and zero within-arm variation NULL out") {
    val thin = Seq((1L, true, false, 1.0), (1L, true, true, 2.0),
      (11L, false, false, 1.0), (11L, false, true, 1.0),
      (12L, false, false, 2.0), (12L, false, true, 4.0))
    val t = Experiment.diffInDiff(thin.toDF("unit", "treat", "post", "value"),
      "unit", "treat", "post", "value").collect().head
    assert(!t.isNullAt(t.fieldIndex("delta")), "delta still reported")
    assert(t.isNullAt(t.fieldIndex("se")) && t.isNullAt(t.fieldIndex("z")))
    // identical per-unit changes in both arms: se = 0 -> z undefined
    val flat = Seq(
      (1L, true, false, 0.0), (1L, true, true, 5.0),
      (2L, true, false, 1.0), (2L, true, true, 6.0),
      (11L, false, false, 0.0), (11L, false, true, 2.0),
      (12L, false, false, 3.0), (12L, false, true, 5.0))
    val f = Experiment.diffInDiff(flat.toDF("unit", "treat", "post", "value"),
      "unit", "treat", "post", "value").collect().head
    assert(f.getAs[Double]("delta") === 3.0)
    assert(f.isNullAt(f.fieldIndex("se")) && f.isNullAt(f.fieldIndex("significant")))
  }
}
