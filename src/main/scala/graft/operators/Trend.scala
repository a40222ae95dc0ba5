package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Per-group ordinary-least-squares trend fitting — the "is this metric
  * drifting" primitive behind ingest monitors and quality dashboards:
  * for each key, fit y = a + b·x over (x, y) observations and report
  * slope, intercept, and r² from SUFFICIENT STATISTICS — one grouped
  * aggregation, no iteration, no per-group state beyond six numbers.
  *
  * Determinism contract (the whole point vs a naive double `avg`):
  * the six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
  * in EXACT decimal — y quantized to integer units (the q90 discipline),
  * x centered per key to its min (exact long) so products fit
  * DECIMAL(19,0)×DECIMAL(19,0) → DECIMAL(38,0) in any engine — so the
  * sums are independent of partition/merge order. The scalar combination
  * afterward (slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept, r²) is a
  * FIXED-ORDER double expression over those exact sums: deterministic by
  * IEEE arithmetic alone, replayed verbatim in SQL (q156).
  *
  * Magnitude contract: |x−xmin| and |y·10^d| must satisfy
  * n·max|xc|·max|yq| < 10^19 (the DECIMAL(19,0) sum bound) — generous
  * for slot-indexed metrics (say n ≤ 10⁷ rows/key, xc ≤ 10⁴ slots,
  * yq ≤ 10⁷ units); pick `yQuantDecimals` to fit.
  *
  * Degenerate keys report NULL: slope/intercept/r² when all x equal,
  * r² additionally when all y equal (zero variance — r² undefined).
  *
  * Output: (keyCols*, n, x_min, slope, intercept, r2) — slope in value
  * units per x unit, intercept = fitted y at x = x_min, both rounded
  * to 6. */
object Trend {

  def olsTrend(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      yQuantDecimals: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keys = keyCols.map(col)
    val ys = math.pow(10.0, yQuantDecimals)
    val D = DecimalType(19, 0)
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys ++ Seq(col(xCol).cast("long").as("__x"),
        round(col(yCol) * ys).cast("long").as("__yq")): _*)
    val xmins = base.groupBy(keys: _*).agg(min(col("__x")).as("x_min"))
    val stats = base.join(xmins, keyCols)
      .withColumn("__xc", (col("__x") - col("x_min")).cast(D))
      .withColumn("__yd", col("__yq").cast(D))
      .groupBy(keys: _*)
      .agg(
        first(col("x_min")).as("x_min"),
        count(lit(1)).as("n"),
        sum(col("__xc")).as("sx"),
        sum(col("__yd")).as("sy"),
        sum(col("__xc") * col("__yd")).as("sxy"),
        sum(col("__xc") * col("__xc")).as("sxx"),
        sum(col("__yd") * col("__yd")).as("syy"))
    // fixed-order double combination over the exact decimal sums — every
    // term below must appear in the SAME order in the SQL replay
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slopeU = num / denx
    stats.select(keys ++ Seq(
      col("n"), col("x_min"),
      when(denx =!= 0.0, round(slopeU / ys, 6)).as("slope"),
      when(denx =!= 0.0, round((sy / n - slopeU * (sx / n)) / ys, 6)).as("intercept"),
      when(denx =!= 0.0 && deny =!= 0.0,
        round((num / denx) * (num / deny), 6)).as("r2")): _*)
  }

  /** EWMA control chart (Roberts 1959; the SPC standard for drift that a
    * plain z-against-mean misses): per key, score the LATEST bucket of a
    * regular series against the exponentially-weighted mean of its
    * trailing window — recent buckets dominate, so a slow ramp trips the
    * chart while the q199-style flat-mean z still averages it away.
    *
    * Exactness trick (why λ is fixed at 1/2): a truncated normalized
    * EWMA over the last `window` priors needs weights λ(1−λ)^j — with
    * λ = 1/2 the UNNORMALIZED weights are the integers 2^(window−j), so
    * numerator Σ x·w and denominators Σw, Σw² accumulate EXACTLY in
    * decimal/long (partition-order-proof, the olsTrend rule) and
    * normalization happens once, in the fixed-order double combination.
    * The truncation tail (≤ 2^−window of total weight) is the documented
    * approximation — at the default window=8 that is 0.4%.
    *
    * z = (x_last − ewma) / (s · √(Σw²)/Σw): s is the plain sample sd of
    * the prior window (the SPC convention: process σ from history), and
    * √(Σw²)/Σw is the exact variance shrinkage of the weighted mean —
    * the truncated-window form of √(λ/(2−λ)).
    *
    * Keys need ≥ `minPriors` prior buckets and s > 0 to score (fresh and
    * constant series surface with NULL z, never NaN). Values quantize to
    * `valueQuantDecimals` like [[olsTrend]]'s y.
    *
    * Scale shape: one row_number window per key (the series is ALREADY
    * bucketed — caller aggregates raw events to (key, bucket, value)
    * first, so this sorts series points, not events) + one grouped
    * aggregation; output is keys-sized.
    *
    * Output: (keyCols*, x_ord, n_prior, x_last, ewma, sd_prior, z,
    * flagged) — ewma/sd/z rounded to 4; flagged = |z| > limit. */
  def ewmaChart(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String,
      window: Int = 8,
      limit: Double = 3.0,
      minPriors: Int = 3,
      valueQuantDecimals: Int = 2): DataFrame = {
    require(window >= 2 && window <= 25,
      s"window $window outside [2, 25] (the squared-weight sum " +
        "2^(2(window-1))·2 must stay inside int64)")
    require(minPriors >= 2, s"minPriors $minPriors must be >= 2 (sd needs it)")
    val keys = keyCols.map(col)
    val ys = math.pow(10.0, valueQuantDecimals)
    val D = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("__ord").desc)
    val ranked = df
      .where(col(ordCol).isNotNull && col(valueCol).isNotNull)
      .select(keys ++ Seq(col(ordCol).cast("long").as("__ord"),
        round(col(valueCol) * ys).cast("long").as("__vq")): _*)
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= window + 1)
    // prior weight: newest prior (r=2) carries 2^(window-1), oldest kept
    // (r=window+1) carries 2^0
    val wgt = when(col("__r") >= 2,
      pow(lit(2.0), lit(window + 1) - col("__r")).cast("long"))
    val stats = ranked.groupBy(keys: _*).agg(
      max(when(col("__r") === 1, col("__ord"))).as("x_ord"),
      max(when(col("__r") === 1, col("__vq"))).as("__xl"),
      count(when(col("__r") >= 2, lit(1))).as("n_prior"),
      sum(wgt).as("__sw"),
      sum(wgt * wgt).as("__sww"),
      sum((wgt.cast(D) * col("__vq").cast(D))).as("__swx"),
      sum(when(col("__r") >= 2, col("__vq").cast(D))).as("__sx"),
      sum(when(col("__r") >= 2, col("__vq").cast(D) * col("__vq").cast(D)))
        .as("__sxx"))
    // fixed-order double combination (mirrored verbatim in the SQL replay)
    val n = col("n_prior").cast("double")
    val sw = col("__sw").cast("double")
    val sww = col("__sww").cast("double")
    val swx = col("__swx").cast("double")
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val xl = col("__xl").cast("double")
    val ewma = swx / sw
    val varS = (sxx - sx * sx / n) / (n - 1.0)
    val z = (xl - ewma) / (sqrt(varS) * sqrt(sww) / sw)
    val scored = stats
      .withColumn("__ok",
        col("n_prior") >= minPriors && varS > 0.0)
      .select(keys ++ Seq(
        col("x_ord"), col("n_prior"),
        round(xl / ys, 4).as("x_last"),
        when(col("n_prior") >= 1, round(ewma / ys, 4)).as("ewma"),
        when(col("__ok"), round(sqrt(varS) / ys, 4)).as("sd_prior"),
        when(col("__ok"), round(z, 4)).as("z"),
        when(col("__ok"), abs(z) > limit).as("flagged")): _*)
    scored
  }

  /** Two-sided tabular CUSUM change-point chart (Page 1954) per key over
    * an ordered series — the drift monitor that localizes WHERE a metric
    * shifted, where [[ewmaChart]] flags the latest point and L31/L33
    * compare whole distributions: small persistent shifts accumulate in
    * the cusum statistic long before any single point looks anomalous.
    *
    * Statistic, pinned for replay: z_t = (x_t − μ̂)/σ̂ standardized
    * against the key's FIRST `refSlots` slots (the in-control reference
    * window); S⁺ follows the recursion max(0, S⁺ + z − k), S⁻ follows
    * max(0, S⁻ − z − k), alarm when either exceeds `threshold`. The
    * recursion is computed DECLARATIVELY via the reflection identity
    * S_t = C_t − min(0, min_{j≤t} C_j) with C the plain cumulative sum
    * of (±z − k) — two window functions (running sum + running min),
    * no sequential scan, no recursion — and every cumulative value
    * accumulates in DECIMAL(28,6) over 6-rounded z's, so partition
    * order cannot perturb a digit and the DuckDB replay matches by hash.
    *
    * Keys with fewer than `refSlots` slots or a zero reference σ̂ are
    * dropped (no in-control model to test against). Window state is one
    * partition per key ordered by slot — per-key series length is
    * calendar-bounded (the L90 grid rule), never corpus-bounded.
    *
    * Output per (key, slot): x, z, s_pos, s_neg, alarm_pos, alarm_neg. */
  def cusum(
      series: DataFrame,
      keyCol: String,
      slotCol: String,
      valueCol: String,
      refSlots: Int = 7,
      slack: Double = 0.5,
      threshold: Double = 4.0,
      roundTo: Int = 6): DataFrame = {
    require(refSlots >= 2, s"refSlots $refSlots must be >= 2 (sd needs it)")
    require(slack >= 0, s"slack $slack must be >= 0")
    // Integer-valued series ONLY (r14, ADVICE): the exact reference sums
    // and the DuckDB replay both ride int64 x. A silent cast("long")
    // would TRUNCATE fractional metrics toward zero (2.7 -> 2) while
    // StreamingCusum ROUNDS via quantDecimals (2.7 -> 3) — fail loud
    // instead; pre-quantize fractional metrics (round(v·10^d)) to match
    // the streaming twin's quantization before calling.
    series.schema(valueCol).dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Trend.cusum: value column '$valueCol' must be integral (got $dt) — " +
          "pre-quantize fractional series with round(v * 10^d) to mirror " +
          "StreamingCusum's quantDecimals")
    }
    val ZDEC = DecimalType(28, 6)
    val SD = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(keyCol).orderBy(slotCol)
    val base = series
      .where(col(slotCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(slotCol).cast("long").as("slot"),
        col(valueCol).cast("long").as("x"))
      .withColumn("__r", row_number().over(
        Window.partitionBy("key").orderBy("slot")))
    // in-control reference: exact integer/decimal sums over the first
    // refSlots slots; keys too short to form the reference drop out
    val ref = base.where(col("__r") <= refSlots)
      .groupBy("key")
      .agg(count(lit(1)).as("n_ref"),
        sum(col("x")).as("s"),
        sum(col("x").cast(SD) * col("x").cast(SD)).as("sq"))
      .where(col("n_ref") === refSlots)
    // fixed-order double combination (mirrored verbatim in the SQL replay)
    val nD = col("n_ref").cast("double")
    val sD = col("s").cast("double")
    val sqD = col("sq").cast("double")
    val mean = sD / nD
    val varr = (sqD - sD * sD / nD) / nD
    val sd = sqrt(greatest(varr, lit(0.0)))
    val scored = base.join(
        ref.select(col("key"), mean.as("__mu"), sd.as("__sd")), "key")
      .where(col("__sd") > 0.0)
      .withColumn("__z",
        round((col("x").cast("double") - col("__mu")) / col("__sd"), roundTo)
          .cast(ZDEC))
    val wRun = Window.partitionBy("key").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = lit(slack).cast(ZDEC)
    val cp = sum(col("__z") - k).over(wRun)
    val cn = sum((-col("__z")) - k).over(wRun)
    scored
      .withColumn("__cp", cp)
      .withColumn("__cn", cn)
      .withColumn("__sp", col("__cp") - least(min(col("__cp")).over(wRun), lit(0).cast(ZDEC)))
      .withColumn("__sn", col("__cn") - least(min(col("__cn")).over(wRun), lit(0).cast(ZDEC)))
      .select(col("key").as(keyCol), col("slot"), col("x"),
        col("__z").cast("double").as("z"),
        col("__sp").cast("double").as("s_pos"),
        col("__sn").cast("double").as("s_neg"),
        (col("__sp").cast("double") > threshold).as("alarm_pos"),
        (col("__sn").cast("double") > threshold).as("alarm_neg"))
      .orderBy(keyCol, "slot")
  }
}
