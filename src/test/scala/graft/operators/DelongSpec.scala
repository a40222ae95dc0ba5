package graft.operators

import graft.SparkSpecBase

/** DeLong paired-AUC comparison contracts, checked against a
  * brute-force Scala computation of the published estimator (DeLong,
  * DeLong & Clarke-Pearson 1988): per-row placements with half-tie
  * credit, sample covariances of the placement vectors (n−1
  * denominators), Var(Δ) from the (1, −1) contrast, z from the
  * unrounded doubles. */
class DelongSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  /** (aucA, aucB, varDelta) the published way: placements per ROW. */
  private def brute(rows: Seq[(Long, Long, Boolean)]): (Double, Double, Double) = {
    val pos = rows.filter(_._3)
    val neg = rows.filterNot(_._3)
    def vPos(s: Long, axis: ((Long, Long, Boolean)) => Long): Double =
      neg.map(r => if (axis(r) < s) 1.0 else if (axis(r) == s) 0.5 else 0.0).sum / neg.size
    def vNeg(s: Long, axis: ((Long, Long, Boolean)) => Long): Double =
      pos.map(r => if (axis(r) > s) 1.0 else if (axis(r) == s) 0.5 else 0.0).sum / pos.size
    val va = pos.map(r => vPos(r._1, _._1)); val vb = pos.map(r => vPos(r._2, _._2))
    val wa = neg.map(r => vNeg(r._1, _._1)); val wb = neg.map(r => vNeg(r._2, _._2))
    def mean(x: Seq[Double]) = x.sum / x.size
    def cov(x: Seq[Double], y: Seq[Double]) = {
      val mx = mean(x); val my = mean(y)
      x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum / (x.size - 1)
    }
    val varD = (cov(va, va) + cov(vb, vb) - 2 * cov(va, vb)) / pos.size +
      (cov(wa, wa) + cov(wb, wb) - 2 * cov(wa, wb)) / neg.size
    (mean(va), mean(vb), varD)
  }

  test("matches the brute-force published estimator on a tied fixture") {
    // ties on both axes, within and across labels; A ranks better than B
    val rows = Seq[(Long, Long, Boolean)](
      (90L, 40L, true), (80L, 40L, true), (80L, 90L, true), (60L, 10L, true),
      (95L, 95L, true),
      (50L, 50L, false), (50L, 80L, false), (30L, 90L, false),
      (80L, 20L, false), (10L, 60L, false), (60L, 60L, false))
    val df = rows.toDF("sa", "sb", "y")
    val out = Quality.delongAucCompare(df, "sa", "sb", "y").collect().head
    val (aucA, aucB, varD) = brute(rows)
    assert(out.getAs[Long]("n") === rows.size)
    assert(out.getAs[Long]("n_pos") === 5L)
    assert(out.getAs[Long]("n_neg") === 6L)
    assert(math.abs(out.getAs[Double]("auc_a") - aucA) < 1e-6)
    assert(math.abs(out.getAs[Double]("auc_b") - aucB) < 1e-6)
    assert(math.abs(out.getAs[Double]("delta") - (aucA - aucB)) < 1e-6)
    assert(math.abs(out.getAs[Double]("se_delta") - math.sqrt(varD)) < 1e-6)
    val z = (aucA - aucB) / math.sqrt(varD)
    assert(math.abs(out.getAs[Double]("z") - z) < 1e-5)
    assert(out.getAs[Boolean]("a_better") === (aucA > aucB))
    assert(out.getAs[Boolean]("significant") === (math.abs(z) > 1.959963984540054))
  }

  test("pairing matters: DeLong variance below the naive unpaired sum on correlated scores") {
    // B = A plus small tied-preserving noise: strongly correlated, so
    // the paired variance must be far below the unpaired Hanley-style
    // sum of the individual placement variances
    val rows = (0 until 40).map { i =>
      val y = i % 2 == 0
      // overlapping ranges so placements VARY (a separable fixture has
      // all-constant placements and a degenerate zero variance)
      val a = (if (y) 50 else 44) + (i * 7 % 13).toLong
      (a, a + (i % 3).toLong, y)
    }
    val (aucA, aucB, varD) = brute(rows)
    // unpaired: S10_aa/npos + S01_aa/nneg + S10_bb/npos + S01_bb/nneg
    val pos = rows.filter(_._3); val neg = rows.filterNot(_._3)
    def vPos(s: Long, ax: ((Long, Long, Boolean)) => Long): Double =
      neg.map(r => if (ax(r) < s) 1.0 else if (ax(r) == s) 0.5 else 0.0).sum / neg.size
    def vNeg(s: Long, ax: ((Long, Long, Boolean)) => Long): Double =
      pos.map(r => if (ax(r) > s) 1.0 else if (ax(r) == s) 0.5 else 0.0).sum / pos.size
    def sv(x: Seq[Double]) = {
      val m = x.sum / x.size
      x.map(v => (v - m) * (v - m)).sum / (x.size - 1)
    }
    val unpaired =
      sv(pos.map(r => vPos(r._1, _._1))) / pos.size + sv(neg.map(r => vNeg(r._1, _._1))) / neg.size +
      sv(pos.map(r => vPos(r._2, _._2))) / pos.size + sv(neg.map(r => vNeg(r._2, _._2))) / neg.size
    assert(varD < unpaired / 2,
      s"paired var $varD should be well below unpaired $unpaired on correlated scores")
    val out = Quality.delongAucCompare(rows.toDF("sa", "sb", "y"), "sa", "sb", "y")
      .collect().head
    assert(math.abs(out.getAs[Double]("se_delta") - math.sqrt(varD)) < 1e-6)
    assert(math.abs(out.getAs[Double]("auc_a") - aucA) < 1e-6)
    assert(math.abs(out.getAs[Double]("auc_b") - aucB) < 1e-6)
  }

  test("degenerate inputs: thin sides NULL out, identical rankings NULL z") {
    // n_pos = 1: covariance undefined -> every test column NULL
    val thin = Seq((5L, 5L, true), (3L, 2L, false), (4L, 1L, false))
      .toDF("sa", "sb", "y")
    val t = Quality.delongAucCompare(thin, "sa", "sb", "y").collect().head
    assert(t.isNullAt(t.fieldIndex("auc_a")) && t.isNullAt(t.fieldIndex("z")))
    // A == B everywhere: Var(delta) = 0 -> AUCs emitted, z/flags NULL
    val same = (0 until 10).map(i => (i.toLong, i.toLong, i % 2 == 0))
      .toDF("sa", "sb", "y")
    val s = Quality.delongAucCompare(same, "sa", "sb", "y").collect().head
    assert(!s.isNullAt(s.fieldIndex("auc_a")))
    assert(s.getAs[Double]("auc_a") === s.getAs[Double]("auc_b"))
    assert(s.isNullAt(s.fieldIndex("z")) && s.isNullAt(s.fieldIndex("significant")))
    // non-integral score rejected loudly
    val bad = Seq((0.5, 1L, true)).toDF("sa", "sb", "y")
    val e = intercept[IllegalArgumentException] {
      Quality.delongAucCompare(bad, "sa", "sb", "y")
    }
    assert(e.getMessage.contains("must be integral"))
  }
}
