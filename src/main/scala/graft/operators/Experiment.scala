package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experiment-readout statistics over per-unit metric frames — the
  * analysis side of the event-analytics family (funnels L66, attribution
  * L105, retention L67/L137): once a curation or product change ships
  * behind an assignment, the question is whether the metric moved, and
  * raw means are noisy exactly when the change is small.
  *
  * Reference scope: EXT (north-star surface); the reference engine has
  * no analytics operators.
  */
object Experiment {

  /** The four SPRT constants for (p0, p1, α, β) — the per-success /
    * per-failure log-likelihood increments and Wald's decision
    * boundaries. Public so a SQL replay embeds the IDENTICAL doubles
    * ([[java.lang.Double.toString]] round-trips, so a generated literal
    * parses back to the same bits in any engine). */
  def sprtConstants(
      p0: Double, p1: Double, alpha: Double, beta: Double)
      : (Double, Double, Double, Double) = {
    require(p0 > 0 && p1 > p0 && p1 < 1,
      s"sprt: need 0 < p0 < p1 < 1 (got p0=$p0, p1=$p1)")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"sprt: error rates must be in (0, 0.5) (got alpha=$alpha, beta=$beta)")
    (math.log(p1 / p0), math.log((1.0 - p1) / (1.0 - p0)),
      math.log((1.0 - beta) / alpha), math.log(beta / (1.0 - alpha)))
  }

  /** Wald's Sequential Probability Ratio Test on a Bernoulli stream
    * (Wald 1945) — the SEQUENTIAL member of the experiment tier: [[cuped]]
    * reads a fixed-horizon experiment with less variance, THIS is the
    * peek-safe monitor for a RUNNING one. Fixed-horizon tests lose their
    * error guarantee the moment anyone peeks-and-stops; the SPRT is built
    * to be read continuously — test H₀: p = p0 vs H₁: p = p1 with
    *   LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)),
    * decide H₁ at LLR ≥ ln((1−β)/α), H₀ at LLR ≤ ln(β/(1−α)), else keep
    * collecting — and Wald's inequalities bound the error rates at ~α/β
    * REGARDLESS of when the boundary is hit (the always-valid-inference
    * ancestor), with the smallest expected sample size of any such test
    * (Wald & Wolfowitz 1948).
    *
    * Granularity: decisions evaluate at `dayCol` boundaries — cumulative
    * (n, k) come from a per-(variant, day) CELLS frame, so the running
    * window is variant×days-sized, never event-sized (the [[cuped]] /
    * ksTest cells discipline; a per-event window would serialize each
    * variant's whole stream through one task). Within-day order never
    * matters because LLR_n depends on (n, k) only.
    *
    * Exactness: k and n are exact longs; the four constants are double
    * literals shared verbatim with the SQL replay ([[sprtConstants]]);
    * LLR is ONE fixed-order double chain; boundary comparisons on the
    * UNROUNDED LLR (the ksTest 1.358 discipline).
    *
    * Output one row per variant: (variant, n, k, rate, llr_final,
    * decision ∈ accept_h1 | accept_h0 | continue, decision_day,
    * n_at_decision, llr_at_decision — the decision_* columns NULL while
    * the test is still running). */
  def sprt(
      df: DataFrame,
      variantCol: String,
      dayCol: String,
      convCol: String,
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.05,
      roundTo: Int = 6): DataFrame = {
    val (la, lb, ua, ub) = sprtConstants(p0, p1, alpha, beta)
    val W = org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(variantCol).isNotNull && col(dayCol).isNotNull &&
        col(convCol).isNotNull)
      .groupBy(col(variantCol).as("variant"), col(dayCol).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convCol), 1L).otherwise(0L)).as("k"))
    val w = W.partitionBy("variant").orderBy("day")
      .rowsBetween(W.unboundedPreceding, 0)
    val llr = col("ck").cast("double") * lit(la) +
      (col("cn") - col("ck")).cast("double") * lit(lb)
    val cum = cells
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("ck", sum(col("k")).over(w))
      .withColumn("llr", llr)
      .withColumn("state",
        when(llr >= lit(ua), lit("accept_h1"))
          .when(llr <= lit(ub), lit("accept_h0"))
          .otherwise(lit("continue")))
    val fin = cum.groupBy("variant").agg(
      max(col("cn")).as("n"), max(col("ck")).as("k"),
      max_by(col("llr"), col("day")).as("llr_final_raw"),
      min(when(col("state") =!= "continue", col("day"))).as("decision_day"))
    val atDec = cum.select(col("variant").as("dv"), col("day").as("dd"),
      col("state").as("decision_raw"), col("cn").as("n_at_decision"),
      col("llr").as("llr_at_decision_raw"))
    fin.join(atDec, col("variant") === col("dv") &&
        col("decision_day") === col("dd"), "left")
      .select(col("variant"), col("n"), col("k"),
        round(col("k").cast("double") / col("n").cast("double"), roundTo)
          .as("rate"),
        round(col("llr_final_raw"), roundTo).as("llr_final"),
        coalesce(col("decision_raw"), lit("continue")).as("decision"),
        col("decision_day"), col("n_at_decision"),
        round(col("llr_at_decision_raw"), roundTo).as("llr_at_decision"))
  }

  /** Mixture SPRT for a two-arm MEAN difference (Robbins 1970's
    * mixture-martingale construction; Johari, Koomen, Pekelis &
    * Walsh 2017 "Peeking at A/B tests" — the always-valid p-value
    * deployed by modern experimentation platforms) — the CONTINUOUS-
    * metric member of the sequential tier: [[sprt]] monitors a
    * Bernoulli rate against a point alternative; revenue/latency/count
    * metrics need a mean test with NO point alternative, and the
    * Gaussian-mixture likelihood ratio
    *   Λ_n = √(V_n/(V_n+τ²)) · exp(δ_n²·τ²/(2·V_n·(V_n+τ²)))
    * (δ_n the cumulative mean difference, V_n its plug-in Welch
    * variance, τ² the mixture scale) is a martingale under H₀ whatever
    * n, so p_n = min_{m≤n} 1/Λ_m is valid at EVERY peek — Wald's
    * inequality generalized to means.
    *
    * Granularity and state: the [[sprt]] day-boundary cells discipline
    * verbatim — per-(day) exact moment cells (n, Σx, Σx² per arm,
    * values integral fail-loud, sums as Decimal(38,0)/(38,6)); the
    * cumulative window runs over the day cells frame, never event
    * rows. Every double (means, Welch V_n, Λ, p) derives from exact
    * decimals through ONE fixed-order chain per day (one exp, one
    * sqrt); the always-valid p is a running MIN over the day window —
    * exact on identical doubles. Decision latches at the FIRST day
    * with p ≤ alphaNum/alphaDen (deterministic integer-scaled compare
    * on the unrounded p: p·alphaDen ≤ alphaNum — one IEEE multiply by
    * an exact small-integer double, avoiding an unrepresentable 0.05
    * literal; deterministic and cross-engine identical, though the
    * multiply itself still rounds to nearest double), and the latch is
    * what the guarantee prices (the [[sprt]] rule).
    *
    * Guards: days with fewer than 2 cumulative observations an arm (or
    * V_n = 0) carry p = 1 (no evidence — never a fabricated rejection);
    * τ² must be positive (fail-loud; scale it to the metric's
    * per-observation variance — the Johari heuristic τ ≈ expected
    * effect size).
    *
    * Output ONE row: (n_treat, n_ctrl, delta_final, p_always_valid,
    * decided, decision_day, n_at_decision, p_at_decision — decision
    * columns NULL while running). */
  def msprt(
      df: DataFrame,
      dayCol: String,
      treatCol: String,
      valueCol: String,
      tau2: Double,
      alphaNum: Int = 1,
      alphaDen: Int = 20,
      roundTo: Int = 6): DataFrame = {
    require(tau2 > 0.0, s"msprt: tau2 $tau2 must be positive")
    require(alphaNum >= 1 && alphaDen > alphaNum,
      s"msprt: alpha $alphaNum/$alphaDen outside (0, 1)")
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Experiment.msprt: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize (micro-units)")
    }
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val W = org.apache.spark.sql.expressions.Window
    val D0 = DecimalType(38, 0)
    val cells = df
      .where(col(dayCol).isNotNull && col(treatCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(dayCol).cast(LongType).as("day"))
      .agg(
        sum(when(col(treatCol), 1L).otherwise(0L)).as("nt"),
        sum(when(!col(treatCol), 1L).otherwise(0L)).as("nc"),
        coalesce(sum(when(col(treatCol), col(valueCol).cast(D0))), lit(0)
          .cast(D0)).as("st"),
        coalesce(sum(when(!col(treatCol), col(valueCol).cast(D0))), lit(0)
          .cast(D0)).as("sc"),
        coalesce(sum(when(col(treatCol),
          col(valueCol).cast(D0) * col(valueCol))), lit(0).cast(D0)).as("qt"),
        coalesce(sum(when(!col(treatCol),
          col(valueCol).cast(D0) * col(valueCol))), lit(0).cast(D0)).as("qc"))
    val wCum = W.partitionBy(pmod(col("day"), lit(1))).orderBy("day")
      .rowsBetween(W.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cnt", sum(col("nt")).over(wCum))
      .withColumn("cnc", sum(col("nc")).over(wCum))
      .withColumn("cst", sum(col("st")).over(wCum))
      .withColumn("csc", sum(col("sc")).over(wCum))
      .withColumn("cqt", sum(col("qt")).over(wCum))
      .withColumn("cqc", sum(col("qc")).over(wCum))
    val ntD = col("cnt").cast(DoubleType)
    val ncD = col("cnc").cast(DoubleType)
    val delta = col("cst").cast(DoubleType) / ntD -
      col("csc").cast(DoubleType) / ncD
    def svar(q: Column, sSum: Column, n: Column) = {
      val nD = n.cast(DoubleType)
      (q.cast(DoubleType) - sSum.cast(DoubleType) *
        sSum.cast(DoubleType) / nD) / (nD - lit(1.0))
    }
    val vN = svar(col("cqt"), col("cst"), col("cnt")) / ntD +
      svar(col("cqc"), col("csc"), col("cnc")) / ncD
    val lam = sqrt(vN / (vN + lit(tau2))) *
      exp(delta * delta * lit(tau2) /
        (lit(2.0) * vN * (vN + lit(tau2))))
    val informative = col("cnt") >= 2L && col("cnc") >= 2L
    val pDay = when(informative && vN > 0,
      least(lit(1.0), lit(1.0) / lam)).otherwise(lit(1.0))
    // the day frame feeds three consumers (final row, decision scan,
    // at-decision lookup) — persist the model-sized frame so the corpus
    // aggregation runs ONCE (the per-call DISK_ONLY cache discipline)
    val scored = cum
      .withColumn("p_day", pDay)
      .withColumn("p_av", min(col("p_day")).over(wCum))
      .withColumn("delta_day", when(informative, round(delta, roundTo)))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // decision: first day the integer-scaled alpha compare holds
    val decided = scored
      .where(col("p_av") * lit(alphaDen) <= lit(alphaNum))
      .groupBy(pmod(col("day"), lit(1)).as("__g"))
      .agg(min(col("day")).as("decision_day"))
      .drop("__g")
    val atDec = scored.select(col("day").as("dd"),
      col("cnt").as("nt_at"), col("cnc").as("nc_at"),
      col("p_av").as("p_at"))
    val fin = scored
      .groupBy(pmod(col("day"), lit(1)).as("__g"))
      .agg(max(col("cnt")).as("n_treat"), max(col("cnc")).as("n_ctrl"),
        max_by(col("delta_day"), col("day")).as("delta_final"),
        max_by(col("p_av"), col("day")).as("p_final"))
      .drop("__g")
    // one-row output: eagerly materialize lineage-free so the day-frame
    // cache releases before return (the dedupFromAssigned discipline)
    val out = fin.join(decided, lit(true), "left")
      .join(atDec, col("decision_day") === col("dd"), "left")
      .select(
        col("n_treat"), col("n_ctrl"), col("delta_final"),
        round(col("p_final"), roundTo).as("p_always_valid"),
        col("decision_day").isNotNull.as("decided"),
        col("decision_day"),
        (col("nt_at") + col("nc_at")).as("n_at_decision"),
        round(col("p_at"), roundTo).as("p_at_decision"))
      .localCheckpoint(true)
    scored.unpersist()
    out
  }

  /** Hodges–Lehmann two-sample shift estimator with the Mann–Whitney
    * inversion CI (Hodges & Lehmann 1963; Moses' CI construction —
    * the distribution-free interval from inverting the rank test) —
    * the ROBUST effect-size member of the experiment tier: the Welch
    * δ in [[diffInDiff]]-class readouts is a MEAN shift, dragged
    * arbitrarily far by one outlier unit; HL = median of all m·n
    * pairwise differences (treat − ctrl) estimates the location shift
    * with a 29% breakdown point, and the CI comes from ORDER STATISTICS
    * of the same differences — no variance estimate, no normality, the
    * companion number a [[graft.operators.Quality.rocAuc]]-style rank
    * test should always be quoted with ("significant, but by how
    * much?").
    *
    * Exactness — the all-integer operator: values integral pre-
    * quantized (the rocAuc contract; the quantization bounds the
    * cells×cells pair frame, the [[graft.operators.Quality.kendallTau]]
    * scale contract); every pairwise difference d = v_t − v_c is an
    * exact long with multiplicity c_t·c_c (documented m·n < 2⁶³ bound);
    * the estimate is the LOWER MEDIAN of the weighted difference
    * multiset — an exact rank pick at (W+1) DIV 2 over the d-ordered
    * cumulative weights (the theilSenBy convention), so shift/ci_lo/
    * ci_hi are EXACT LONGS, no rounding anywhere in the output. The CI
    * ranks use the standard large-sample inversion k = ⌊W/2 −
    * z·√(W·(m+n+1)/12)⌋ (one fixed-order double chain with the
    * 1.959963984540054 literal, floored to an exact rank; Lehmann
    * 1975's normal approximation — documented); CI NULL when k < 1
    * (too few pairs for a 95% interval — never a fabricated bound).
    *
    * Scale shape: ONE corpus pass per arm to value cells; the pair
    * frame is cells_T×cells_C (quantization-bounded); one cumulative
    * window over it (pmod constant-key — model-sized by contract); rank
    * picks are single filtered aggregations. Output ONE row: (n_treat,
    * n_ctrl, n_pairs, shift, ci_lo, ci_hi). */
  def hodgesLehmann(
      df: DataFrame,
      valueCol: String,
      treatCol: String): DataFrame = {
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Experiment.hodgesLehmann: value column '$valueCol' must be " +
          s"integral (got $dt) — pre-quantize with an exact integer " +
          "expression")
    }
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val W = org.apache.spark.sql.expressions.Window
    val base0 = df.where(col(valueCol).isNotNull && col(treatCol).isNotNull)
      .select(col(valueCol).cast(LongType).as("v"), col(treatCol).as("g"))
    val cellsT = base0.where(col("g")).groupBy(col("v").as("vt"))
      .agg(count(lit(1)).as("ct"))
    val cellsC = base0.where(!col("g")).groupBy(col("v").as("vc"))
      .agg(count(lit(1)).as("cc"))
    val counts = base0.agg(
      coalesce(sum(when(col("g"), 1L).otherwise(0L)), lit(0L)).as("m"),
      coalesce(sum(when(!col("g"), 1L).otherwise(0L)), lit(0L)).as("n"))
    // rank targets: exact median rank; CI ranks via ONE floored chain
    val wPairs = col("m") * col("n")
    val wD = wPairs.cast(DoubleType)
    val kloD = floor(wD / lit(2.0) - lit(1.959963984540054) *
      sqrt(wD * (col("m") + col("n") + 1L).cast(DoubleType) / lit(12.0)))
      .cast(LongType)
    val ranks = counts.select(col("m"), col("n"), wPairs.as("w_pairs"),
      expr("(m * n + 1) DIV 2").as("med_r"),
      kloD.as("klo"))
      .withColumn("khi", col("w_pairs") + 1L - col("klo"))
    val pairs = cellsT.crossJoin(cellsC)
      .select((col("vt") - col("vc")).as("d"), (col("ct") * col("cc")).as("w"))
      .groupBy("d").agg(sum(col("w")).as("w"))
    val wCum = W.partitionBy(pmod(col("d"), lit(1))).orderBy("d")
      .rowsBetween(W.unboundedPreceding, 0)
    val cum = pairs.withColumn("cw", sum(col("w")).over(wCum))
      .crossJoin(broadcast(ranks))
    val picks = cum.agg(
      min(when(col("cw") >= col("med_r"), col("d"))).as("shift"),
      min(when(col("klo") >= 1L && col("cw") >= col("klo"), col("d")))
        .as("ci_lo"),
      min(when(col("klo") >= 1L && col("cw") >= col("khi"), col("d")))
        .as("ci_hi"))
    ranks.crossJoin(broadcast(picks))
      .select(col("m").as("n_treat"), col("n").as("n_ctrl"),
        col("w_pairs").as("n_pairs"),
        col("shift"), col("ci_lo"), col("ci_hi"))
  }

  /** Difference-in-differences over a unit panel (the Card & Krueger
    * 1994 canonical design; ancestry to Snow 1855) — the QUASI-
    * experimental member of the experiment tier: [[cuped]] and [[sprt]]
    * read a RANDOMIZED assignment; when treatment was NOT randomized
    * (a policy shipped to one cohort, a crawler change hit one source),
    * the naive post-period comparison confounds the treatment with
    * pre-existing level differences — DiD removes any time-constant
    * unit difference by differencing each unit against itself first:
    *   δ = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
    * identified under parallel trends (the four cell means are emitted
    * so a reader can eyeball exactly that assumption).
    *
    * Inference: per-unit change d_i = S_i,post − S_i,pre (the panel
    * form — differencing within unit absorbs all within-unit
    * correlation, so units are the independent observations), then the
    * Welch two-sample comparison of d̄_T vs d̄_C:
    *   se² = s²_T/n_T + s²_C/n_C,  z = δ/se,
    * two-sided at the full-digit normal literal (the mcnemar rule).
    *
    * Exactness: the metric is the per-unit period TOTAL (the
    * revenue-per-user shape), so d_i is an EXACT Decimal(30,6) sum
    * difference; cross-unit Σd and Σd² accumulate as exact decimals
    * (d clamped into Decimal(19,6) before squaring — documented
    * per-unit-total bound |d| < 10¹²); every double derives from exact
    * decimals through one fixed-order chain with one IEEE sqrt.
    *
    * Guards: all test columns NULL when either arm has < 2 units or
    * se = 0 (no within-arm variation — no evidence scale).
    *
    * Scale shape: ONE map-side-combining aggregation to per-(unit, arm)
    * sums, one reduction to 2 moment rows, a 4-cell means frame — the
    * corpus is touched once ([[cuped]]'s shape). */
  def diffInDiff(
      df: DataFrame,
      unitCol: String,
      treatCol: String,
      postCol: String,
      valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val DEC = DecimalType(30, 6)
    val D19 = DecimalType(19, 6)
    val base = df.where(col(unitCol).isNotNull && col(treatCol).isNotNull &&
      col(postCol).isNotNull && col(valueCol).isNotNull)
    val per = base
      .groupBy(col(unitCol).as("unit"), col(treatCol).as("treat"))
      .agg(
        coalesce(sum(when(col(postCol), col(valueCol).cast(DEC))),
          lit(0).cast(DEC)).as("s_post"),
        coalesce(sum(when(!col(postCol), col(valueCol).cast(DEC))),
          lit(0).cast(DEC)).as("s_pre"))
      .withColumn("d", (col("s_post") - col("s_pre")).cast(D19))
    val mom = per.groupBy("treat").agg(
      count(lit(1)).as("n"),
      sum(col("s_pre")).as("spre"),
      sum(col("s_post")).as("spost"),
      sum(col("d").cast(DecimalType(38, 6))).as("sd"),
      sum(col("d") * col("d")).as("sdd"))
    // 2 arm rows → one readout row (conditional reduction, no pivot)
    val one = mom.agg(
      max(when(col("treat"), col("n"))).as("n_t"),
      max(when(!col("treat"), col("n"))).as("n_c"),
      max(when(col("treat"), col("spre"))).as("spre_t"),
      max(when(col("treat"), col("spost"))).as("spost_t"),
      max(when(!col("treat"), col("spre"))).as("spre_c"),
      max(when(!col("treat"), col("spost"))).as("spost_c"),
      max(when(col("treat"), col("sd"))).as("sd_t"),
      max(when(!col("treat"), col("sd"))).as("sd_c"),
      max(when(col("treat"), col("sdd"))).as("sdd_t"),
      max(when(!col("treat"), col("sdd"))).as("sdd_c"))
    val nT = col("n_t").cast("double")
    val nC = col("n_c").cast("double")
    val delta = col("sd_t").cast("double") / nT -
      col("sd_c").cast("double") / nC
    def svar(sdd: Column, sd: Column, n: Column) =
      (sdd.cast("double") - sd.cast("double") * sd.cast("double") / n) /
        (n - lit(1.0))
    val se = sqrt(svar(col("sdd_t"), col("sd_t"), nT) / nT +
      svar(col("sdd_c"), col("sd_c"), nC) / nC)
    val z = delta / se
    val tested = col("n_t") >= 2L && col("n_c") >= 2L && se > lit(0.0)
    val crit = lit(1.959963984540054)
    one.select(
      col("n_t").as("n_treat"), col("n_c").as("n_ctrl"),
      round(col("spre_t").cast("double") / nT, roundTo).as("mean_pre_treat"),
      round(col("spost_t").cast("double") / nT, roundTo).as("mean_post_treat"),
      round(col("spre_c").cast("double") / nC, roundTo).as("mean_pre_ctrl"),
      round(col("spost_c").cast("double") / nC, roundTo).as("mean_post_ctrl"),
      when(col("n_t") >= 1L && col("n_c") >= 1L, round(delta, roundTo))
        .as("delta"),
      when(tested, round(se, roundTo)).as("se"),
      when(tested, round(z, roundTo)).as("z"),
      when(tested, abs(z) > crit).as("significant"))
  }

  /** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
    * Xu, Kohavi & Walker, WSDM 2013): reduce the variance of a post-
    * period metric `y` with its pre-period covariate `x` via
    *   ŷ = y − θ·(x − x̄),   θ = cov(x, y) / var(x)
    * (θ POOLED across variants — the standard estimator, valid because
    * assignment is independent of pre-period behavior). Typical win:
    * 30–60% variance reduction on strongly autocorrelated metrics, i.e.
    * the same experiment decides in half the traffic.
    *
    * Input: one row per unit — (`variantCol`, `xCol`, `yCol`). Output:
    * one row per variant — n, mean_y, mean_y_cuped, var_y, var_y_cuped,
    * var_reduction (1 − var̂/var), plus the pooled theta repeated per
    * row (the whole-frame constants a readout needs in one place).
    *
    * Determinism contract: metrics are quantized to `quantDecimals`
    * (×10^q → int64 — the olsTrend rule), every cross-unit sum
    * accumulates as exact DECIMAL(38,0), and the final statistics are
    * FIXED-ORDER double combinations of those sums, mirrored verbatim
    * in the SQL replay; partition order cannot perturb a digit. The
    * variance identities used (all from sufficient statistics — no
    * per-unit second pass):
    *   var(y)     = (syy − sy²/n) / (n−1)
    *   cov(x, y)  = (sxy − sx·sy/n) / (n−1)
    *   var(ŷ)     = var(y) − 2θ·cov(x,y) + θ²·var(x)   [per variant]
    *   mean(ŷ)    = sy/n − θ·(sx/n − x̄_pooled)
    *
    * Scale shape: ONE map-side-combining aggregation per variant over
    * the unit frame (six exact sums), one 1-row pooled reduction,
    * variants-sized output — the corpus is touched once. */
  def cuped(
      units: DataFrame,
      variantCol: String = "variant",
      xCol: String = "x",
      yCol: String = "y",
      quantDecimals: Int = 4,
      roundTo: Int = 6): DataFrame = {
    require(quantDecimals >= 0 && quantDecimals <= 6,
      s"quantDecimals $quantDecimals outside [0, 6]")
    val D = DecimalType(38, 0)
    val ys = math.pow(10.0, quantDecimals)
    val q = units
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(variantCol).as("variant"),
        round(col(xCol) * ys).cast("long").cast(D).as("xq"),
        round(col(yCol) * ys).cast("long").cast(D).as("yq"))
    val perVariant = q.groupBy("variant").agg(
      count(lit(1)).as("n"),
      sum(col("xq")).as("sx"),
      sum(col("yq")).as("sy"),
      sum(col("xq") * col("xq")).as("sxx"),
      sum(col("yq") * col("yq")).as("syy"),
      sum(col("xq") * col("yq")).as("sxy"))
    // pooled θ and x̄ from the variant sums (exact decimal re-aggregation)
    val pooled = perVariant.agg(
      sum(col("n")).as("np"),
      sum(col("sx")).as("sxp"),
      sum(col("sy")).as("syp"),
      sum(col("sxx")).as("sxxp"),
      sum(col("sxy")).as("sxyp"))
    // fixed-order double combination — mirrored verbatim in the replay
    val np = col("np").cast("double")
    val sxp = col("sxp").cast("double")
    val syp = col("syp").cast("double")
    val sxxp = col("sxxp").cast("double")
    val sxyp = col("sxyp").cast("double")
    val varXp = (sxxp - sxp * sxp / np) / (np - lit(1.0))
    val covP = (sxyp - sxp * syp / np) / (np - lit(1.0))
    // a constant covariate carries no information: θ pins to 0 (raw
    // means pass through) rather than dividing by zero; a pooled frame
    // of fewer than 2 units has no covariance estimate at all — θ pins
    // to 0 there too instead of emitting NaN (r14, ADVICE)
    val thetaFrame = pooled.select(
      when(np >= 2.0 && varXp > 0.0, covP / varXp).otherwise(lit(0.0))
        .as("__theta"),
      (sxp / np).as("__xbar"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val varY = (syy - sy * sy / n) / (n - lit(1.0))
    val varX = (sxx - sx * sx / n) / (n - lit(1.0))
    val covXY = (sxy - sx * sy / n) / (n - lit(1.0))
    val th = col("__theta")
    val varAdj = varY - lit(2.0) * th * covXY + th * th * varX
    // degenerate variants fail soft, not NaN (r14, ADVICE): a 1-unit
    // variant has no sample variance — its variance columns are NULL;
    // var_reduction is additionally NULL when var_y is exactly 0 (the
    // ratio is undefined, not "no reduction")
    perVariant.crossJoin(broadcast(thetaFrame))
      .select(col("variant"), col("n"),
        round(sy / n / ys, roundTo).as("mean_y"),
        round((sy / n - th * (sx / n - col("__xbar"))) / ys, roundTo)
          .as("mean_y_cuped"),
        when(n >= 2.0, round(varY / ys / ys, roundTo)).as("var_y"),
        when(n >= 2.0, round(varAdj / ys / ys, roundTo)).as("var_y_cuped"),
        when(n >= 2.0 && varY =!= 0.0,
          round(lit(1.0) - varAdj / varY, roundTo)).as("var_reduction"),
        round(th, roundTo).as("theta"))
      .orderBy("variant")
  }
}
