package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[ZOrder.hilbertCode2D]] — verified against a sequential reference
  * (Hamilton's xy2d) and against the curve's DEFINING property: each
  * step of the index walks exactly one cell (Manhattan distance 1),
  * which is precisely what Morton codes do NOT guarantee. */
class HilbertSpec extends SparkSpecBase {

  /** Sequential reference: the classic xy2d. */
  private def ref(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertCode2D equals the sequential reference on random points and bit widths") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    Seq(1, 2, 3, 5, 8, 12).foreach { bits =>
      val n = 1L << bits
      val pts = (1 to 200).map { _ =>
        (math.abs(rnd.nextLong()) % n, math.abs(rnd.nextLong()) % n)
      }.distinct
      val got = ZOrder.hilbertCode2D(
          pts.toDF("x", "y"), col("x"), col("y"), bits)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      pts.foreach { case (x, y) =>
        assert(got((x, y)) === ref(x, y, bits), s"bits=$bits ($x,$y)")
      }
    }
  }

  test("the full grid is a bijection and every curve step moves exactly one cell") {
    val s = spark; import s.implicits._
    val bits = 3
    val n = 1 << bits
    val grid = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val rows = ZOrder.hilbertCode2D(grid.toDF("x", "y"), col("x"), col("y"), bits)
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until (n.toLong * n)).toSeq,
      "indices are a bijection onto [0, 4^bits)")
    rows.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"curve step ($x1,$y1)->($x2,$y2) must be Manhattan distance 1")
    }
    // the Z-curve does NOT have this property at the same size — the
    // contrast that justifies the operator
    val mort = grid.map { case (x, y) =>
      val d = (0 until bits).map { i =>
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
      }.reduce(_ | _)
      (d, (x, y))
    }.sortBy(_._1)
    val jumps = mort.sliding(2).count { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(jumps > 0, "sanity: Morton takes diagonal jumps on the same grid")
  }

  test("hilbertSqlCtes generates the identical index in DuckDB-shaped SQL (spot-check shape)") {
    val sql = ZOrder.hilbertSqlCtes("g", bits = 2, carry = Seq("id"))
    assert(sql.contains("h0 AS") && sql.contains("h2 AS") && sql.contains("hil AS"))
    assert(sql.contains("xor(3 *"), "per-round arithmetic present")
    // equality with the operator is asserted end-to-end by q191's oracle gate
  }

  test("NULL coordinates yield a NULL index; bits bounds enforced") {
    val s = spark; import s.implicits._
    val df = Seq((Some(1L), Some(2L)), (None, Some(1L))).toDF("x", "y")
    val out = ZOrder.hilbertCode2D(df, col("x"), col("y"), 4).collect()
    assert(out.count(_.isNullAt(2)) === 1)
    intercept[IllegalArgumentException](
      ZOrder.hilbertCode2D(df, col("x"), col("y"), 31))
  }
}
