package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Survival / retention analysis over right-censored unit durations —
  * the time-to-event member of the event-analytics family (funnels
  * L66, retention cohorts L67/L137, experiment readouts
  * [[Experiment]]): "how long do users stay / documents survive
  * re-crawl / labels remain valid", asked of data where many units
  * have NOT yet had the event — dropping them (or counting them as
  * events) biases every naive rate, and censoring-aware estimators are
  * the fix the survival literature standardized.
  *
  * Reference scope: EXT (north-star surface); the reference engine has
  * no analytics operators.
  */
object Survival {

  private def requireIntegral(df: DataFrame, c: String, op: String): Unit =
    df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Survival.$op: column '$c' must be integral (got $dt) — " +
          "pre-quantize durations to exact integer time units")
    }

  /** Restricted mean survival time (Irwin 1949; the τ-restricted AUC
    * reading popularized for clinical reporting by Royston & Parmar
    * 2013) — the SCALAR readout of [[kaplanMeier]]'s curve: "average
    * days survived (retained, converted-free) in the first τ days",
    * the number a dashboard quotes where a whole curve cannot be, and
    * the standard effect summary when proportional hazards is dubious
    * (the log-rank's power assumption). RMST(τ) = ∫₀^τ S(t)dt — for the
    * KM step function an EXACT sum of step areas: S is 1 on [0, t₁),
    * S(tᵢ) on [tᵢ, tᵢ₊₁), intervals clamped at τ.
    *
    * Exactness: event times and widths are exact longs; each step area
    * is ONE product of the deterministic KM survival double (the
    * [[kaplanMeier]] log-space chain) and an exact integer width,
    * accumulated as Decimal(38,12) — order-insensitive; the initial
    * [0, min(t₁, τ)) interval contributes exactly its width (S = 1).
    * Guards: fail-loud τ ≥ 1; rmst NULL when no events exist at all
    * (the curve never steps — an all-censored corpus has no KM curve
    * to integrate; the raw follow-up mean is the right tool there);
    * rmst NULL when τ exceeds the maximum observed FOLLOW-UP (event or
    * censored — the KM curve is undefined past the last unit under
    * observation, so integrating to a larger τ would silently
    * extrapolate the last survival level; survRM2 and kin error here).
    * `t_max_followup` (max duration over ALL units) is emitted beside
    * `t_max` (last EVENT time) so a consumer can see how much of
    * [0, τ] rides the final flat segment.
    *
    * Scale shape: [[kaplanMeier]]'s (one corpus pass to duration
    * cells), plus one column-pruned scan-agg for max follow-up (the
    * guard needs censored durations, which the KM event table drops),
    * then model-frame window arithmetic. Output ONE row:
    * (tau, n_event_times, t_max, t_max_followup, rmst). */
  def rmst(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      tau: Long,
      roundTo: Int = 6): DataFrame = {
    require(tau >= 1L, s"rmst: tau $tau must be >= 1 time unit")
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 12)
    val W = org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(df, durationCol, eventCol, roundTo = 12)
      .select(col("t"), col("survival"))
    val wLead = W.partitionBy(pmod(col("t"), lit(1))).orderBy("t")
    val stepped = km
      .withColumn("t_next", coalesce(lead(col("t"), 1).over(wLead), lit(tau)))
      .withColumn("area",
        (col("survival") *
          greatest(lit(0L), least(col("t_next"), lit(tau)) -
            least(col("t"), lit(tau))).cast("double")).cast(DEC))
    val maxFu = df.agg(
      max(col(durationCol).cast("long")).as("t_max_followup"))
    stepped.agg(
        count(lit(1)).as("n_event_times"),
        max(col("t")).as("t_max"),
        min(col("t")).as("t_first"),
        coalesce(sum(col("area")), lit(0).cast(DEC)).as("steps_d"))
      .join(broadcast(maxFu), lit(true))
      .select(
        lit(tau).as("tau"),
        col("n_event_times"),
        col("t_max"),
        col("t_max_followup"),
        when(col("n_event_times") > 0L && lit(tau) <= col("t_max_followup"),
          round(
            least(col("t_first"), lit(tau)).cast("double") +
              col("steps_d").cast("double"), roundTo)).as("rmst"))
  }

  /** Kaplan–Meier product-limit survival estimator (Kaplan & Meier
    * 1958) with Greenwood's variance (Greenwood 1926) — THE
    * right-censored survival curve: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)
    * over the distinct EVENT times t_i, with n_i the at-risk count
    * (units whose duration ≥ t_i) and d_i the events at t_i. A unit
    * with `eventCol` false is censored at its duration: it leaves the
    * risk set after t without contributing an event — the one-line
    * accounting that makes the estimator unbiased under independent
    * censoring, where both the naive "ignore censored" and "count
    * censored as events" rates are wrong in opposite directions.
    *
    * Exactness: durations integral (fail-loud); the corpus collapses to
    * a per-distinct-duration cells frame (t, m, d) in ONE pass; risk
    * sets are exact cumulative longs (n_i = N − Σ m before t_i); each
    * factor (n_i−d_i)/n_i is ONE division of exact longs — identical
    * doubles cross-engine — and the product accumulates in LOG space:
    * per-time ln(factor) casts to Decimal(38,12) and cumulative-sums
    * over the t-ordered cells window (ORDER-INSENSITIVE decimal
    * addition; never a float product chain), S = exp(cumsum) — one exp
    * per emitted row. Greenwood terms d/(n·(n−d)) accumulate the same
    * way; se = S·√(cumsum); ci_lo/ci_hi are the Greenwood LINEAR 95%
    * interval (z literal 1.959963984540054) clamped into [0, 1]
    * (documented choice — the log-minus-log transform is available in
    * the literature but the linear form is the replayable baseline).
    *
    * Absorbing edge, handled exactly: at a time with n_i = d_i (the
    * whole remaining risk set fails) the factor is 0 — S is EXACTLY 0
    * from that time on (emitted as 0.0, not exp(−∞)) and se/CI are NULL
    * there (Greenwood divides by n−d = 0; undefined, never fabricated).
    *
    * Output one row per distinct event time, ordered by time:
    * (t, n_risk, d, censored_at, survival, se, ci_lo, ci_hi).
    * Censoring-only times emit no row (the curve does not step) but
    * their units leave the risk set — the standard KM table shape.
    *
    * Scale shape: ONE corpus aggregation to the duration cells frame
    * (distinct-duration-bounded — the rocAuc quantization contract:
    * coarsen the time unit to bound it); every window after runs over
    * that model-sized frame under the pmod(t,1) constant-key idiom
    * (the allowlisted cells-frame window marker — never a corpus-row
    * window). */
  /** Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) — the
    * EXPERIMENT-tier companion of [[kaplanMeier]]: did the change move
    * the time-to-event DISTRIBUTION, asked of right-censored arms where
    * a means comparison is wrong twice over (censored units have no
    * mean, and the curves can cross). At each distinct pooled event
    * time: O−E accumulates d₁ᵢ − dᵢ·n₁ᵢ/nᵢ, the hypergeometric variance
    * accumulates dᵢ·(n₁ᵢ/nᵢ)·(1−n₁ᵢ/nᵢ)·(nᵢ−dᵢ)/(nᵢ−1), and
    * z = (O−E)/√V is standard normal under H₀ (identical survival) —
    * the ranking-free, censoring-exact test every clinical/retention
    * readout quotes.
    *
    * Exactness: the O−E numerator d₁ᵢnᵢ − dᵢn₁ᵢ is an EXACT long per
    * time (the d_j discipline); its division by nᵢ and the variance
    * chain are ONE fixed-order double sequence each, accumulating as
    * Decimal(38,12) (order-insensitive; documented nᵢ·dᵢ ≲ 10¹⁵
    * exact-numerator bound); times with nᵢ ≤ 1 carry no variance term
    * (the n−1 guard). z/chi2/significant NULL when V = 0 (no
    * informative event times — single-arm data or all-tied everything;
    * never a fabricated z). `significant` compares the UNROUNDED |z|
    * to the two-sided normal 95% literal 1.959963984540054;
    * `treat_longer` reads the exact sign of O−E (fewer observed events
    * in the treatment arm than expected ⇒ it survives longer).
    *
    * Scale shape: ONE corpus pass to per-(duration) cells carrying both
    * arms' (m, d); risk sets are cumulative longs over the t-ordered
    * cells window (model-sized by the [[kaplanMeier]] quantization
    * contract); one final reduction. Output ONE row: (n_treat, n_ctrl,
    * events_treat, events_ctrl, o_treat, e_treat, o_minus_e, var_lr,
    * z, chi2, significant, treat_longer). */
  def logRank(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      treatCol: String,
      roundTo: Int = 6): DataFrame = {
    requireIntegral(df, durationCol, "logRank")
    val W = org.apache.spark.sql.expressions.Window
    val DEC = DecimalType(38, 12)
    val base = df
      .where(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(treatCol).isNotNull)
      .select(col(durationCol).cast(LongType).as("t"),
        col(treatCol).as("g"),
        when(col(durationCol) >= 0L, col(eventCol))
          .otherwise(raise_error(lit(
            "Survival.logRank: negative duration — durations are " +
              "elapsed time units and must be >= 0"))).as("ev"))
    val cells = base.groupBy("t")
      .agg(
        sum(when(col("g"), 1L).otherwise(0L)).as("m1"),
        sum(when(!col("g"), 1L).otherwise(0L)).as("m0"),
        sum(when(col("g") && col("ev"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("g") && col("ev"), 1L).otherwise(0L)).as("d0"))
    val wBefore = W.partitionBy(pmod(col("t"), lit(1))).orderBy("t")
      .rowsBetween(W.unboundedPreceding, -1)
    val wAll = W.partitionBy(pmod(col("t"), lit(1)))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val staged = cells
      .withColumn("nt1", sum(col("m1")).over(wAll))
      .withColumn("nt0", sum(col("m0")).over(wAll))
      .withColumn("n1", col("nt1") -
        coalesce(sum(col("m1")).over(wBefore), lit(0L)))
      .withColumn("n0", col("nt0") -
        coalesce(sum(col("m0")).over(wBefore), lit(0L)))
      .withColumn("n", col("n1") + col("n0"))
      .withColumn("d", col("d1") + col("d0"))
      .where(col("d") > 0L)
    val nD = col("n").cast("double")
    val dD = col("d").cast("double")
    val n1D = col("n1").cast("double")
    // O−E term: exact-long numerator, ONE division; E term: one division
    val oeTerm = ((col("d1") * col("n") - col("d") * col("n1"))
      .cast("double") / nD).cast(DEC)
    val eTerm = (dD * n1D / nD).cast(DEC)
    // hypergeometric variance: one fixed-order chain, n > 1 guarded
    val vTerm = when(col("n") > 1L,
      (dD * n1D / nD) * ((nD - n1D) / nD) *
        ((nD - dD) / (nD - lit(1.0)))).otherwise(lit(0.0)).cast(DEC)
    val agg = staged.agg(
      max(col("nt1")).as("n_treat"), max(col("nt0")).as("n_ctrl"),
      coalesce(sum(col("d1")), lit(0L)).as("events_treat"),
      coalesce(sum(col("d0")), lit(0L)).as("events_ctrl"),
      coalesce(sum(eTerm), lit(0).cast(DEC)).as("e1_d"),
      coalesce(sum(oeTerm), lit(0).cast(DEC)).as("oe_d"),
      coalesce(sum(vTerm), lit(0).cast(DEC)).as("v_d"))
    val oeD = col("oe_d").cast("double")
    val vD = col("v_d").cast("double")
    val z = oeD / sqrt(vD)
    val crit = lit(1.959963984540054)
    agg.select(
      col("n_treat"), col("n_ctrl"),
      col("events_treat"), col("events_ctrl"),
      col("events_treat").as("o_treat"),
      round(col("e1_d").cast("double"), roundTo).as("e_treat"),
      round(oeD, roundTo).as("o_minus_e"),
      round(vD, roundTo).as("var_lr"),
      when(col("v_d") > 0, round(z, roundTo)).as("z"),
      when(col("v_d") > 0, round(z * z, roundTo)).as("chi2"),
      when(col("v_d") > 0, abs(z) > crit).as("significant"),
      when(col("v_d") > 0, oeD < lit(0.0)).as("treat_longer"))
  }

  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      roundTo: Int = 6): DataFrame = {
    requireIntegral(df, durationCol, "kaplanMeier")
    val W = org.apache.spark.sql.expressions.Window
    val DEC = DecimalType(38, 12)
    val base = df
      .where(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durationCol).cast(LongType).as("t"),
        when(col(durationCol) >= 0L, col(eventCol))
          .otherwise(raise_error(lit(
            "Survival.kaplanMeier: negative duration — durations are " +
              "elapsed time units and must be >= 0"))).as("ev"))
    val cells = base.groupBy("t")
      .agg(count(lit(1)).as("m"),
        sum(when(col("ev"), 1L).otherwise(0L)).as("d"))
    val wCum = W.partitionBy(pmod(col("t"), lit(1))).orderBy("t")
      .rowsBetween(W.unboundedPreceding, 0)
    val wBefore = W.partitionBy(pmod(col("t"), lit(1))).orderBy("t")
      .rowsBetween(W.unboundedPreceding, -1)
    val wAll = W.partitionBy(pmod(col("t"), lit(1)))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val nD = col("n_risk").cast("double")
    val dD = col("d").cast("double")
    // per-time log factor and Greenwood term — exact-long divisions,
    // guarded at the absorbing n = d edge (handled via zeros_through)
    val lnF = when(col("n_risk") > col("d"),
      log((nD - dD) / nD)).otherwise(lit(0.0)).cast(DEC)
    val gTerm = when(col("n_risk") > col("d"),
      dD / (nD * (nD - dD))).otherwise(lit(0.0)).cast(DEC)
    val staged = cells
      .withColumn("n_total", sum(col("m")).over(wAll))
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("m"))
        .over(wBefore), lit(0L)))
      .where(col("d") > 0L)
    // NOTE: the cumulative windows below run over EVENT rows only —
    // n_risk was computed from ALL rows first (censoring-only times
    // shrink the risk set without stepping the curve)
    val cum = staged
      .withColumn("ln_s", sum(lnF).over(wCum))
      .withColumn("g_cum", sum(gTerm).over(wCum))
      .withColumn("zeros_through",
        sum(when(col("n_risk") === col("d"), 1L).otherwise(0L)).over(wCum))
    val sCol = when(col("zeros_through") > 0L, lit(0.0))
      .otherwise(exp(col("ln_s").cast("double")))
    val seCol = sCol * sqrt(col("g_cum").cast("double"))
    val z = lit(1.959963984540054)
    cum.select(
      col("t"),
      col("n_risk"),
      col("d"),
      (col("m") - col("d")).as("censored_at"),
      round(sCol, roundTo).as("survival"),
      when(col("zeros_through") === 0L, round(seCol, roundTo)).as("se"),
      when(col("zeros_through") === 0L,
        round(greatest(sCol - z * seCol, lit(0.0)), roundTo)).as("ci_lo"),
      when(col("zeros_through") === 0L,
        round(least(sCol + z * seCol, lit(1.0)), roundTo)).as("ci_hi"))
  }
}
