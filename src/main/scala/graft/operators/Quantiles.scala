package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles WITHOUT unbounded aggregate state — the
  * scale-safe replacement for Spark's `percentile` TypedImperativeAggregate, which
  * buffers a value→count map of every distinct value per group and merges
  * it on ONE task per group (an OOM at 100 TB; the r10 q11 finding).
  *
  * Sort-based two-pass shape instead:
  *   1. collapse to distinct (group, value) multiplicities — ONE hash
  *      exchange with map-side combining (duplicates never travel);
  *   2. running count per group via a streaming window frame (sort-based,
  *      spill-backed: rows stream through in order, nothing buffers);
  *   3. each requested quantile's two bracketing order statistics are
  *      picked by a conditional aggregation over the rank intervals
  *      (cum−c, cum], then linearly interpolated — `quantile_cont`
  *      semantics, identical to Spark's `percentile` up to final-ulp
  *      formula association (spec-pinned at 1e-9).
  *
  * NULL values are excluded, matching the aggregate's semantics; groups
  * whose values are all NULL are absent from the output (the aggregate
  * would emit NULL — callers needing those rows outer-join this frame).
  *
  * Output: (groupCol, n, <one double column per qs key>), unrounded.
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Map[String, Double]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    require(qs.values.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    require(!qs.contains("n") && qs.keys.forall(_ != groupCol),
      "quantile names must not collide with the n/group output columns")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val ns = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("g").orderBy("v")))
    // 1-indexed interpolation position pos = 1 + (n−1)q; the row whose
    // covered rank interval (cum−c, cum] contains k is the k-th order stat
    def pos(q: Double) = lit(1.0) + (col("n") - 1).cast("double") * q
    def kLo(q: Double) = floor(pos(q)).cast("long")
    def kHi(q: Double) = least(kLo(q) + 1, col("n"))
    def at(k: Column) =
      max(when(col("cum") - col("c") < k && k <= col("cum"), col("v")))
    val sorted = qs.toSeq.sortBy(_._1)
    val aggs = first(col("n")).as("n") +: sorted.flatMap { case (name, q) =>
      Seq(at(kLo(q)).as(s"__lo_$name"), at(kHi(q)).as(s"__hi_$name"))
    }
    val picks = cum.join(broadcast(ns), "g")
      .groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
    val out = sorted.foldLeft(picks) { case (acc, (name, q)) =>
      val frac = pos(q) - floor(pos(q))
      acc.withColumn(name,
        col(s"__lo_$name") + (col(s"__hi_$name") - col(s"__lo_$name")) * frac)
    }
    out.select(col("g").as(groupCol) +: col("n") +:
      sorted.map { case (name, _) => col(name) }: _*)
  }

  // --- Mergeable histogram quantiles ---------------------------------
  //
  // The [[graft.operators.Rollup]]-family member for quantiles: exact
  // quantiles don't merge (a non-mergeable statistic by nature), but a
  // fixed-geometry histogram does — per-partition bucket counts are
  // additive, so per-day histograms re-aggregate losslessly and any
  // partition range answers approximate quantiles with a PROVEN error
  // bound (≤ half a bucket width) without rescanning raw history.
  // Geometry (quantized bounds + bits) is sketch config, like KMV's k:
  // fixed at build time, shared by every partition that will ever merge.
  // All bucket/rank arithmetic is exact int64 (IntegralDivide, the
  // [[ZOrder.intBucket]] rule), so the whole estimator replays
  // bit-identically in integer SQL (q153).

  /** Quantized value bounds for the histogram geometry — one aggregation,
    * two driver scalars. Quantization = round(v·10^d) into int64 (the
    * q90 component-quantization discipline, cross-engine portable). */
  def quantBounds(df: DataFrame, valueCol: String, quantDecimals: Int = 6): (Long, Long) = {
    val s = math.pow(10.0, quantDecimals)
    val r = df.where(col(valueCol).isNotNull)
      .agg(min(round(col(valueCol) * s).cast("long")),
        max(round(col(valueCol) * s).cast("long"))).head()
    require(!r.isNullAt(0), s"quantBounds: no non-null '$valueCol' values")
    (r.getLong(0), r.getLong(1))
  }

  private def intDiv(a: Column, b: Column): Column = ZOrder.intDiv(a, b)

  /** Per-partition histogram: (part, keyCols*, bucket, cnt). One grouped
    * aggregation with map-side combining; ≤ keys·2^bits rows per
    * partition travel. Values outside the geometry clamp into the edge
    * buckets (late data beyond the reference bounds still counts). */
  def histogramPartials(
      df: DataFrame,
      partCol: Column,
      keyCols: Seq[String],
      valueCol: String,
      loQ: Long,
      hiQ: Long,
      bits: Int,
      quantDecimals: Int = 6): DataFrame = {
    val s = math.pow(10.0, quantDecimals)
    val vq = least(greatest(round(col(valueCol) * s).cast("long"), lit(loQ)), lit(hiQ))
    df.where(col(valueCol).isNotNull)
      .select(partCol.as("part") +: keyCols.map(col) :+
        ZOrder.intBucket(vq, loQ, hiQ, bits).as("bucket"): _*)
      .groupBy(col("part") +: keyCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms over any set of partitions: bucket counts are
    * additive, so the merge is ONE re-aggregation — lossless by
    * construction, cost = partitions·keys·2^bits, independent of raw
    * corpus size. */
  def histogramMerge(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials.groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates off a merged histogram. `qs` maps output name →
    * integer percent (exact rank arithmetic: r = ceil(n·p/100) in int64).
    * The estimate is the midpoint of the bucket containing the r-th order
    * statistic, so |est − exact_r| ≤ half a bucket width by construction
    * (spec-asserted against [[exactQuantiles]]). The per-key cumulative
    * walk runs over the MODEL-sized histogram frame (keys × ≤ 2^bits
    * rows), never the corpus. Output: (keyCols*, n, <name per q>). */
  def histogramQuantiles(
      hist: DataFrame,
      keyCols: Seq[String],
      qs: Map[String, Int],
      loQ: Long,
      hiQ: Long,
      bits: Int,
      quantDecimals: Int = 6): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    require(qs.values.forall(p => p >= 1 && p <= 100),
      s"percents must be integers in [1,100]: $qs")
    val keys = keyCols.map(col)
    val ns = hist.groupBy(keys: _*).agg(sum(col("cnt")).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(keys: _*).orderBy("bucket")))
    val sorted = qs.toSeq.sortBy(_._1)
    val aggs = first(col("n")).as("n") +: sorted.map { case (name, p) =>
      val r = intDiv(col("n") * p + 99, lit(100L))
      min(when(col("cum") >= r, col("bucket"))).as(s"__b_$name")
    }
    val picks = cum.join(broadcast(ns), keyCols)
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
    val scale = math.pow(10.0, quantDecimals)
    val out = sorted.foldLeft(picks) { case (acc, (name, _)) =>
      val estUnits = lit(loQ) + intDiv(
        (col(s"__b_$name") * 2 + 1) * (hiQ - loQ + 1L), lit(1L << (bits + 1)))
      acc.withColumn(name, estUnits.cast("double") / scale)
    }
    out.select(keys ++ (col("n") +: sorted.map { case (name, _) => col(name) }): _*)
  }

  /** Winsorized robust statistics — mean and sd AFTER clipping each
    * group's values into its own [pLo, pHi] quantile band (Winsorizing:
    * tails are CLAMPED to the band edge, not dropped, so n is
    * preserved — the robust-moments standard for heavy-tailed quality
    * scores, latencies, prices, where a raw mean is one outlier away
    * from useless). Clip bounds come from [[exactQuantiles]] (the
    * bounded-state two-pass operator — never Spark's per-group
    * percentile buffer), so the whole statistic is exact.
    *
    * Determinism: clip bounds are the engine-identical interpolated
    * quantiles (the q11 contract, = DuckDB `quantile_cont`); clipped
    * values and their squares round into exact decimal before the sums
    * (the [[graft.queries.H]] rule), and mean/sd are fixed-order double
    * combinations over those exact sums ([[graft.operators.Trend]]'s
    * discipline), rounded.
    *
    * Output per group: (groupCol, n, n_clipped, win_mean, win_sd) —
    * `n_clipped` counts the clamped tail values (the audit column: a
    * high clip rate means the band, not the data, is the story);
    * `win_sd` NULL for n < 2.
    *
    * Scale shape: exactQuantiles' two passes + one equi-join of the
    * corpus against the groups-sized bounds frame (broadcast) + one
    * final aggregation with map-side combining. */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95,
      roundTo: Int = 6): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"winsorizedStats: bad band [$pLo, $pHi]")
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(30, 6)
    val bounds = exactQuantiles(df, groupCol, valueCol,
        Map("wlo" -> pLo, "whi" -> pHi))
      .select(col(groupCol), col("wlo"), col("whi"))
    val v = col(valueCol).cast("double")
    val cv = least(greatest(v, col("wlo")), col("whi"))
    val clipped = df.where(col(valueCol).isNotNull)
      .join(broadcast(bounds), groupCol)
      .select(col(groupCol), cv.as("cv"),
        (v < col("wlo") || v > col("whi")).as("clip"))
    val agg = clipped.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      count(when(col("clip"), 1)).as("n_clipped"),
      sum(col("cv").cast(DEC)).as("s1"),
      sum((col("cv") * col("cv")).cast(DEC)).as("s2"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val varW = (n * s2 - s1 * s1) / (n * (n - lit(1.0)))
    agg.select(col(groupCol), col("n"), col("n_clipped"),
      round(s1 / n, roundTo).as("win_mean"),
      when(col("n") > 1,
        round(sqrt(when(varW > 0.0, varW).otherwise(lit(0.0))), roundTo))
        .as("win_sd"))
  }

  /** Equi-depth (equal-frequency) binning — the discretization primitive
    * feature pipelines and optimizer histograms run on: per group, cut
    * the value distribution into `nBins` bins of (as near as ties allow)
    * equal population, and report each bin's population and value span.
    *
    * The scale-safe shape: NOT `ntile` (a single global sort window per
    * group whose partition must hold the whole group); instead the
    * [[exactQuantiles]] two-pass frame picks the nBins−1 DISCRETE cut
    * points — cut_i = the smallest value whose running count reaches
    * ⌈i·n/nBins⌉, an exact integer-rank selection with no interpolation
    * and no rounding — and rows assign by comparing against the
    * broadcast group-sized cut table: bin = 1 + Σᵢ [v > cutᵢ]. Raw
    * doubles compare exactly in any engine, so assignment is
    * bit-portable. Ties sharing a cut value land in the lower bin
    * (population skews with ties — equal-frequency is exact only up to
    * tie mass, the standard contract).
    *
    * Output: (groupCol, bin, n_rows, v_min, v_max, share round 6). */
  def equiDepthBins(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins $nBins outside [2, 1000]")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
    val counts = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("g").orderBy("v")))
    val ns = counts.groupBy("g").agg(sum(col("c")).as("n"))
    // k_i = ceil(i·n/nBins) = (i·n + nBins−1) DIV nBins, exact int64
    val cutAggs = (1 until nBins).map { i =>
      min(when(col("cum") >=
        expr(s"(${i}L * n + ${nBins - 1}L) DIV ${nBins}L"), col("v")))
        .as(s"__cut_$i")
    }
    val cuts = cum.join(broadcast(ns), "g")
      .groupBy("g")
      .agg(first(col("n")).as("n"), cutAggs: _*)
    val bin = (1 until nBins).map(i =>
      when(col("v") > col(s"__cut_$i"), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    base.join(broadcast(cuts), "g")
      .select(col("g"), col("v"), col("n"), bin.as("bin"))
      .groupBy("g", "bin")
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"),
        round(count(lit(1)).cast("double") / first(col("n")), 6).as("share"))
      .withColumnRenamed("g", groupCol)
  }
}
