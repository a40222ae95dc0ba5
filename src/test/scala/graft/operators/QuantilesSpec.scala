package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The bounded-state exact-quantile operator must agree with Spark's own
  * `percentile` aggregate (the unbounded-state reference semantics) on
  * every group shape — THE property that licenses q11's plan swap. */
class QuantilesSpec extends SparkSpecBase {

  private val QS = Map(
    "q00" -> 0.0, "q25" -> 0.25, "q50" -> 0.5,
    "q77" -> 0.77, "q90" -> 0.9, "q100" -> 1.0)

  test("exactQuantiles == percentile aggregate across group shapes and q values") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random fixture: duplicates, skewed group
    // sizes, a single-row group, an all-equal group, nulls to ignore
    val rows = (
      (1 to 257).map(i => ("a", ((i * 2654435761L) % 1000).toDouble / 7.0)) ++
      (1 to 64).map(i => ("b", (i % 9).toDouble)) ++         // heavy duplicates
      Seq(("c", 42.0)) ++                                    // single row
      (1 to 16).map(_ => ("d", 5.5)) ++                      // all equal
      Seq(("a", Double.NaN)).filter(_ => false)
    ).toDF("g", "v")
      .union(Seq(("b", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v").select(col("g"), col("v").cast("double")))
    val mine = Quantiles.exactQuantiles(rows, "g", "v", QS).collect()
      .map(r => r.getString(0) ->
        QS.keys.toSeq.sorted.map(k => r.getDouble(r.fieldIndex(k)))).toMap
    val ref = rows.groupBy("g").agg(
        QS.toSeq.sortBy(_._1).map { case (k, q) =>
          percentile(col("v"), lit(q)).as(k)
        }.head,
        QS.toSeq.sortBy(_._1).map { case (k, q) =>
          percentile(col("v"), lit(q)).as(k)
        }.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        QS.keys.toSeq.sorted.map(k => r.getDouble(r.fieldIndex(k)))).toMap
    assert(mine.keySet === ref.keySet,
      "all-NULL-value groups aside, group coverage must match")
    for (g <- ref.keySet; (a, b) <- mine(g).zip(ref(g)))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"group $g: $a vs percentile's $b")
  }

  test("n column counts non-null values; all-null group is absent") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None), ("z", None))
      .toDF("g", "v").select(col("g"), col("v").cast("double"))
    val out = Quantiles.exactQuantiles(rows, "g", "v", Map("med" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 2L, 1.5)),
      "nulls excluded from rank arithmetic; all-null group absent")
  }

  test("plan: no percentile buffer, no Expand, distinct values travel once") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map(i => (s"g${i % 3}", (i % 17).toDouble)).toDF("g", "v")
    val p = Quantiles.exactQuantiles(rows, "g", "v", Map("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), "no unbounded percentile aggregate")
    assert(!p.contains("Expand"), "no Expand")
    assert(!p.contains("CartesianProduct"), "keyed joins only")
  }

  test("histogram quantiles: estimate within half a bucket width of the exact order statistic") {
    val e = graft.core.Tables.load(spark, sfDir, "events")
    val bits = 10
    val (lo, hi) = Quantiles.quantBounds(e, "value")
    val hist = Quantiles.histogramMerge(
      Quantiles.histogramPartials(e, to_date(col("ts")), Seq("event_type"),
        "value", lo, hi, bits),
      Seq("event_type"))
    val est = Quantiles.histogramQuantiles(hist, Seq("event_type"),
        Map("p50" -> 50, "p90" -> 90), lo, hi, bits)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // the PROVEN bound is against the ceil(n*p/100)-th ORDER STATISTIC
    // (same rank convention, same bucket by construction) — an
    // interpolated quantile can sit a sparse-tail gap away, so it is not
    // the reference here
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value")
    val byType = e.where(col("value").isNotNull)
      .select(col("event_type"), col("value"), row_number().over(w).as("rn"))
      .collect().groupBy(_.getString(0))
    val width = (hi - lo + 1).toDouble / (1L << bits) / 1e6
    assert(est.keySet === byType.keySet)
    est.foreach { case (g, (n, p50, p90)) =>
      val vals = byType(g).sortBy(_.getInt(2)).map(_.getDouble(1))
      assert(n === vals.length.toLong, s"$g n")
      def orderStat(p: Int) = vals(((n * p + 99) / 100).toInt - 1)
      assert(math.abs(p50 - orderStat(50)) <= width / 2 + 1e-6,
        s"$g p50 $p50 vs ${orderStat(50)}")
      assert(math.abs(p90 - orderStat(90)) <= width / 2 + 1e-6,
        s"$g p90 $p90 vs ${orderStat(90)}")
    }
  }

  test("histogram quantiles: error bound holds on random data against a sequential reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val bits = 4 + rnd.nextInt(6)
      val rows = (1 to 500 + rnd.nextInt(1500)).map { _ =>
        (s"g${rnd.nextInt(3)}", (rnd.nextDouble() - 0.3) * (1 + rnd.nextInt(50)))
      }
      val df = rows.toDF("g", "v")
      val (lo, hi) = Quantiles.quantBounds(df, "v")
      val hist = Quantiles.histogramMerge(
        Quantiles.histogramPartials(df, lit(0), Seq("g"), "v", lo, hi, bits), Seq("g"))
      val est = Quantiles.histogramQuantiles(hist, Seq("g"),
          Map("p25" -> 25, "p50" -> 50, "p75" -> 75, "p99" -> 99), lo, hi, bits)
        .collect().map(r => r.getString(0) ->
          Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      val width = (hi - lo + 1).toDouble / (1L << bits) / 1e6
      rows.groupBy(_._1).foreach { case (g, grp) =>
        // the reference order statistic over QUANTIZED values (the
        // operator's stated precision), rank = ceil(n*p/100)
        val sorted = grp.map(t => math.round(t._2 * 1e6) / 1e6).sorted
        Seq(25, 50, 75, 99).zipWithIndex.foreach { case (p, i) =>
          val stat = sorted(((sorted.size.toLong * p + 99) / 100).toInt - 1)
          assert(math.abs(est(g)(i) - stat) <= width / 2 + 1e-9,
            s"trial $trial g=$g p$p: est ${est(g)(i)} vs stat $stat (width $width)")
        }
      }
    }
  }

  test("histogram merge is lossless: per-day partials re-aggregate to the whole-range histogram") {
    val e = graft.core.Tables.load(spark, sfDir, "events")
    val (lo, hi) = Quantiles.quantBounds(e, "value")
    val partials = Quantiles.histogramPartials(e, to_date(col("ts")),
      Seq("event_type"), "value", lo, hi, 8)
    val whole = Quantiles.histogramPartials(e, lit(0), Seq("event_type"),
      "value", lo, hi, 8)
    val a = Quantiles.histogramMerge(partials, Seq("event_type"))
      .orderBy("event_type", "bucket").collect().map(_.toString)
    val b = Quantiles.histogramMerge(whole, Seq("event_type"))
      .orderBy("event_type", "bucket").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("histogram geometry: out-of-bounds values clamp into the edge buckets") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", -99.0), ("a", 0.5), ("a", 99.0)).toDF("g", "v")
    // geometry fixed to [0, 1] in value space
    val hist = Quantiles.histogramPartials(rows, lit(0), Seq("g"), "v",
      0L, 1000000L, bits = 4)
    val buckets = hist.collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    // 0.5 -> units 500000 -> (500000*16) div 1000001 = 7 (exact int div)
    assert(buckets === Map(0L -> 1L, 7L -> 1L, 15L -> 1L))
  }

  test("winsorizedStats: hand-computed clamp, robust moments, outlier immunity") {
    val s = spark; import s.implicits._
    // g: 1..10 plus a wild outlier 1000; band [p10, p90] over 11 values:
    // pos = 1 + 10·q -> p10 = 2nd order stat = 2, p90 = 10th = 10
    val rows = ((1 to 10).map(i => ("g", i.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val r = Quantiles.winsorizedStats(rows, "k", "v", pLo = 0.1, pHi = 0.9)
      .collect().head
    assert(r.getLong(1) === 11L)
    // clamped: 1 -> 2 and 1000 -> 10 (two values outside the band)
    assert(r.getLong(2) === 2L)
    val cvs = Seq(2.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10)
    val mean = cvs.sum / 11
    assert(math.abs(r.getDouble(3) - mean) < 1e-6,
      s"winsorized mean ${r.getDouble(3)} vs $mean — the outlier must not move it")
    val sd = math.sqrt(cvs.map(c => (c - mean) * (c - mean)).sum / 10)
    assert(math.abs(r.getDouble(4) - sd) < 1e-4)
    // n = 1: sd NULL, mean = the value itself (band collapses onto it)
    val one = Quantiles.winsorizedStats(Seq(("x", 5.0)).toDF("k", "v"), "k", "v")
      .collect().head
    assert(one.getDouble(3) === 5.0 && one.isNullAt(4))
  }

  test("equiDepthBins: 12 distinct values into 4 bins of 3") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 12).map(i => ("a", i.toDouble)).toDF("g", "v")
    val out = Quantiles.equiDepthBins(df, "g", "v", 4)
      .orderBy("bin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("v_min"), r.getAs[Double]("v_max")))
    assert(out.toSeq === Seq(
      (1L, 3L, 1.0, 3.0), (2L, 3L, 4.0, 6.0),
      (3L, 3L, 7.0, 9.0), (4L, 3L, 10.0, 12.0)))
  }

  test("equiDepthBins: tie mass lands in the lower bin") {
    val sp = spark
    import sp.implicits._
    // eight 1.0s and four 2.0s, 2 bins: cut = 1.0 (rank 6 value), so all
    // 1.0s stay in bin 1 (v > cut puts only 2.0 in bin 2)
    val df = (Seq.fill(8)(1.0) ++ Seq.fill(4)(2.0)).map(("a", _)).toDF("g", "v")
    val out = Quantiles.equiDepthBins(df, "g", "v", 2)
      .orderBy("bin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_rows")))
    assert(out.toSeq === Seq((1L, 8L), (2L, 4L)))
  }

  test("equiDepthBins equals a sequential reference on random groups") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 500).map(i => ("g" + i % 3, math.floor(rnd.nextDouble() * 50) / 10))
    val nBins = 5
    val got = Quantiles.equiDepthBins(rows.toDF("g", "v"), "g", "v", nBins)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("bin")) -> r.getAs[Long]("n_rows"))
      .toMap
    val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size
      val cuts = (1 until nBins).map(i => vs(((i.toLong * n + nBins - 1) / nBins).toInt - 1))
      rs.map(_._2).groupBy(v => 1 + cuts.count(v > _))
        .map { case (b, g2) => (g, b.toLong) -> g2.size.toLong }
    }
    assert(got === ref)
  }

  test("equiDepthBins: partition invariance and parameter bounds") {
    val sp = spark
    import sp.implicits._
    val rows = (1 to 300).map(i => ("k" + i % 2, (i * 37 % 101).toDouble))
    def run(np: Int) = Quantiles.equiDepthBins(
      rows.toDF("g", "v").repartition(np), "g", "v", 4)
      .orderBy("g", "bin").collect().map(_.toString).mkString("|")
    assert(run(1) === run(32))
    intercept[IllegalArgumentException](
      Quantiles.equiDepthBins(rows.toDF("g", "v"), "g", "v", 1))
  }
}
