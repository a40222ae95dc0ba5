package graft.operators

import graft.SparkSpecBase

/** [[Preference.bradleyTerry]] contracts: a sequential MM reference
  * (same decimal accumulation, round by round), transitive ordering on
  * a connected tournament, equal-record symmetry, the Ford-condition
  * divergence pinned, and partition invariance. */
class PreferenceSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def dec12(x: Double) = BigDecimal.valueOf(x)
    .setScale(12, BigDecimal.RoundingMode.HALF_UP)
  private def r6(x: Double) = BigDecimal.valueOf(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def ref(games: Seq[(String, String)], iters: Int)
      : Map[String, Double] = {
    val pairs = games.filter(g => g._1 != g._2)
      .groupBy(g => (Seq(g._1, g._2).min, Seq(g._1, g._2).max))
      .map { case ((a, b), gs) =>
        (a, b, gs.size.toLong, gs.count(g => g._1 == a).toLong) }.toSeq
    val wins = (pairs.map(p => p._1 -> p._4) ++
      pairs.map(p => p._2 -> (p._3 - p._4)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val items = wins.keys.toSeq.sorted
    val k = items.size
    var s = items.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val den = scala.collection.mutable.Map(
        items.map(_ -> BigDecimal(0)): _*)
      pairs.foreach { case (a, b, n, _) =>
        val term = dec12(n.toDouble / (s(a) + s(b)))
        den(a) += term; den(b) += term
      }
      val raw = items.map(i => i -> wins(i).toDouble / den(i).toDouble).toMap
      val z = items.map(i => dec12(raw(i))).sum
      s = items.map(i => i -> raw(i) * k.toDouble / z.toDouble).toMap
    }
    s
  }

  test("sequential MM reference equality; transitive order; symmetry; invariance") {
    // connected tournament: A beats B 3-1, B beats C 3-1, A beats C 3-1
    def series(w: String, l: String, wl: Int, ll: Int) =
      Seq.fill(wl)((w, l)) ++ Seq.fill(ll)((l, w))
    val games = series("A", "B", 3, 1) ++ series("B", "C", 3, 1) ++
      series("A", "C", 3, 1)
    val got = Preference.bradleyTerry(games.toDF("wi", "li"), "wi", "li")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_games"), r.getAs[Long]("n_wins"),
          r.getAs[Double]("strength"), r.getAs[Long]("rank")))).toMap
    val want = ref(games, 8)
    Seq("A", "B", "C").foreach { i =>
      assert(got(i)._3 === r6(want(i)), s"item $i sequential equality")
    }
    assert(got("A")._3 > got("B")._3 && got("B")._3 > got("C")._3,
      "transitive strength order")
    assert(got("A")._4 === 1L && got("C")._4 === 3L)
    assert(got("A")._1 === 8L && got("A")._2 === 6L)
    // equal records are symmetric: both exactly mean strength 1
    val even = series("X", "Y", 2, 2)
    val ge = Preference.bradleyTerry(even.toDF("wi", "li"), "wi", "li")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(ge("X") === 1.0 && ge("Y") === 1.0)
    // random connected games: reference equality + partition invariance
    val rnd = new scala.util.Random(43)
    val pool = Seq("p", "q", "r", "s", "t")
    val rg = Seq.fill(150) {
      val i = pool(rnd.nextInt(5)); var j = pool(rnd.nextInt(5))
      while (j == i) j = pool(rnd.nextInt(5))
      (i, j)
    }
    val wr = ref(rg, 8)
    val g1 = Preference.bradleyTerry(rg.toDF("wi", "li"), "wi", "li")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    pool.foreach(i => assert(g1(i) === r6(wr(i)), s"random item $i"))
    val g2 = Preference.bradleyTerry(
      rg.reverse.toDF("wi", "li").repartition(9), "wi", "li")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(g2 === g1, "partition invariance of the decimal round sums")
  }

  test("Ford-condition divergence pinned: a never-losing item absorbs the scale") {
    val games = Seq.fill(5)(("KING", "pawn"))
    val got = Preference.bradleyTerry(games.toDF("wi", "li"), "wi", "li")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    // k=2, mean-1 normalization: the undefeated item's trajectory heads
    // to 2 and the winless one to 0 — surfaced, never clamped
    assert(got("KING") > 1.9 && got("pawn") < 0.1)
    // self-games and null rows drop
    val clean = Preference.bradleyTerry(
      (games :+ (("KING", "KING")) :+ ((null, "pawn")))
        .toDF("wi", "li"), "wi", "li").collect()
    assert(clean.map(_.getAs[Long]("n_games")).sum === 10L)
    intercept[IllegalArgumentException](Preference.bradleyTerry(
      games.toDF("wi", "li"), "wi", "li", iters = 0))
  }
}
