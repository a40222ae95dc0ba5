package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk profiling — the governance tier of the PII
  * family ([[graft.functions.Clean]] REDACTS direct identifiers; these
  * operators MEASURE the quasi-identifier risk that survives
  * redaction): k-anonymity (Sweeney 2002 — a row is k-anonymous when at
  * least k rows share its quasi-identifier combination) and l-diversity
  * (Machanavelli et al. 2007 — an equivalence class is l-diverse when
  * it contains at least l distinct sensitive values, closing
  * k-anonymity's homogeneity attack). A training-data release gate
  * reads these profiles the way a quality gate reads the Gopher stats.
  *
  * Scale shape: everything is one-or-two grouped aggregations with
  * map-side combining — the QI groupBy is the only corpus-scale
  * shuffle; class sizes and the histograms over them are ≤ corpus and
  * typically tiny. No windows (the cumulative view a dashboard wants is
  * the caller's trivial post-step over a model-sized histogram), no
  * driver state, everything SQL-replayable (q167/q168).
  */
object Privacy {

  /** Equivalence-class size histogram over the quasi-identifier columns:
    * (class_size, n_classes, n_rows, row_share ∈ [0,1], 6 decimals),
    * ordered by class_size. `class_size = 1` rows are fully re-
    * identifiable by the QI combination; the k-anonymity of the release
    * is the histogram's smallest class_size. Rows with NULL QI values
    * form their own classes (NULL is a value to a linkage attacker). */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityProfile: at least one QI column")
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
    val hist = classes.groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
    val total = hist.agg(sum(col("n_rows")).as("__total"))
    hist.crossJoin(broadcast(total))
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        round(col("n_rows") / col("__total"), 6).as("row_share"))
      .orderBy("class_size")
  }

  /** One-row release verdict at threshold `k`: rows in classes smaller
    * than k, their share, and whether the release is k-anonymous. */
  def kAnonymityRisk(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"kAnonymityRisk: k $k must be >= 1")
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
    classes.agg(
        coalesce(sum(when(col("class_size") < k, col("class_size"))), lit(0L))
          .as("rows_at_risk"),
        sum(col("class_size")).as("__total"),
        coalesce(min(col("class_size")), lit(0L)).as("k_anonymity"))
      .select(col("rows_at_risk"),
        round(col("rows_at_risk") / col("__total"), 6).as("risk_share"),
        col("k_anonymity"),
        (col("k_anonymity") >= k).as(s"is_${k}_anonymous"))
  }

  /** Differentially-private release counts — the RELEASE step the
    * k-anonymity/l-diversity audit gates: per-group counts with
    * Laplace(1/ε) noise (the counting query's sensitivity is 1), the
    * standard ε-DP mechanism (Dwork et al. 2006). Noise is SEEDED and
    * engine-portable by design: u = (polyhash(group keys ++ seed) + 0.5)
    * / P is a deterministic uniform in (0,1), and the Laplace draw is
    * its inverse CDF −(1/ε)·sign(u−½)·ln(1−2|u−½|) — so a release is
    * reproducible and SQL-replayable (q172), which is what an auditable
    * pipeline needs. The honesty note that belongs in every docstring
    * claiming DP: the ε guarantee is an information-theoretic statement
    * about RANDOM noise — with a seeded draw it holds against an
    * adversary who does not hold the seed (the standard practical-PRG
    * stance); treat the seed as a secret, draw once per release, and
    * never publish the exact mechanism inputs.
    *
    * TWO CONDITIONS ARE PART OF THE GUARANTEE, not hygiene:
    *
    *  1. `seed` is a PER-RELEASE secret nonce — never reuse it across
    *     releases of evolving data. The noise is a pure function of
    *     (keys, seed), so two same-seed releases carry IDENTICAL
    *     per-group noise and their difference is the exact true delta
    *     (an individual's arrival/departure published in the clear).
    *     The weekly-report usage MUST mix a fresh nonce (date, release
    *     id) into the seed each run.
    *  2. The emitted KEY SET leaks unless the key domain is public.
    *     With `keyDomain` = null only observed groups are emitted — a
    *     group's very presence (count ≥ 1) is disclosed noiselessly,
    *     which is only admissible when the domain is public knowledge
    *     (enum codes, published region lists). For data-dependent
    *     domains, pass `keyDomain`: a PUBLIC key list (chosen without
    *     looking at the data) — every domain key is emitted, absent
    *     ones as 0 + noise, so presence is hidden. (The alternative,
    *     stability-based thresholding, suppresses groups with noisy
    *     count below a τ(ε, δ) cut and costs a δ; this operator ships
    *     the ε-only domain form.)
    *
    * Output: (keys*, true_count withheld by design — publishing it
    * would defeat the mechanism — noisy_count rounded to `roundTo`).
    * One grouped aggregation (+ one left join from the public domain
    * when given) + a narrow projection; ln is the one libm call, tamed
    * the q66 way (rounded output, both engines' ln agree within the
    * rounding at these magnitudes). */
  def dpNoisyCounts(
      df: DataFrame,
      keyCols: Seq[String],
      epsilon: Double,
      seed: String,
      roundTo: Int = 4,
      keyDomain: DataFrame = null): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisyCounts: at least one key column")
    require(epsilon > 0, s"dpNoisyCounts: epsilon $epsilon must be > 0")
    require(seed.nonEmpty, "dpNoisyCounts: seed must be a fresh per-release nonce")
    val P = 1000000007L
    // the portable per-group uniform: the house avalanche hash
    // (Sampling's AsciiPolyHash kernel + quadratic finalizer - short
    // rendered keys NEED the avalanche or u clusters near 0) over the
    // '|'-joined key rendering, seed as the salt (NULL renders empty;
    // callers whose key renderings can collide under joining should
    // pre-render - the q76 replica idiom covers the SQL side)
    val keyStr = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val u = (Sampling.avalanche(keyStr, seed).cast("double") + 0.5) / P.toDouble
    val lap = -(lit(1.0) / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    val grouped = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val based =
      if (keyDomain == null) grouped
      else keyDomain.select(keyCols.map(col): _*).distinct()
        .join(grouped, keyCols, "left")
        .withColumn("__n", coalesce(col("__n"), lit(0L)))
    based.select(keyCols.map(col) :+
      round(col("__n") + lap, roundTo).as("noisy_count"): _*)
  }

  /** Differentially-private release MEAN (the Laplace ratio estimator —
    * Dwork et al. 2006's counting mechanism applied twice): values
    * clamp into the PUBLIC bound [lo, hi] (bounded contribution — the
    * clamp is what makes the sum's sensitivity `hi − lo` a fact rather
    * than a hope), then
    * `noisy_mean = (Σclamped + Lap(2(hi−lo)/ε)) / max(n + Lap(2/ε), 1)`
    * — ε split evenly across the two releases (basic composition), the
    * denominator floored at 1 so a small group cannot yield a
    * sign-flipped or infinite mean. TRUE n and sum are withheld from
    * the output ([[dpNoisyCounts]]' release discipline), and the bound
    * must be chosen WITHOUT looking at the data (it is part of the
    * privacy claim).
    *
    * NEIGHBOR MODEL — part of the claim, stated explicitly: the scales
    * assume BOUNDED (replace-one) neighbors, where two adjacent
    * datasets differ by swapping one individual's row. Replacing a row
    * moves the clamped sum by at most (hi − lo) and the count not at
    * all — the count noise here is belt-and-braces, not budget this
    * model needs. Under UNBOUNDED (add/remove) neighbors the clamped
    * sum's sensitivity is max(|lo|, |hi|) — for bounds like [100, 101]
    * that is ~100× (hi − lo), and this mechanism's noise would be
    * ~100× too small for the claimed ε. Callers needing add/remove
    * protection must widen the sum scale to max(|lo|, |hi|)·2/ε
    * themselves (and then the count noise does earn its half of the
    * budget, since counts move under add/remove).
    *
    * Same seeded engine-portable uniform as [[dpNoisyCounts]] (one
    * draw per group per release, salts `seed|sum` / `seed|cnt` —
    * decorrelated by the avalanche), same honesty notes: the ε
    * guarantee is about random noise, treat the seed as a secret, and
    * the seed is a PER-RELEASE nonce — same-seed releases of evolving
    * data publish exact deltas (see [[dpNoisyCounts]] condition 1).
    * Clamped values accumulate in exact decimal, so the pre-noise sum
    * is partition-order-free and the whole release replays in SQL. */
  def dpNoisyMean(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      seed: String,
      roundTo: Int = 4): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisyMean: at least one key column")
    require(hi > lo, s"dpNoisyMean: empty bound [$lo, $hi]")
    require(epsilon > 0, s"dpNoisyMean: epsilon $epsilon must be > 0")
    require(seed.nonEmpty, "dpNoisyMean: seed must be a fresh per-release nonce")
    import org.apache.spark.sql.types.DecimalType
    val P = 1000000007L
    val keyStr = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    def lap(salt: String, scale: Double) = {
      val u = (Sampling.avalanche(keyStr, salt).cast("double") + 0.5) / P.toDouble
      -lit(scale) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    }
    val clamped = least(greatest(valueCol.cast("double"), lit(lo)), lit(hi))
    df.where(valueCol.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(clamped.cast(DecimalType(30, 6))).as("__s"))
      .select(keyCols.map(col) :+
        round(
          (col("__s").cast("double") + lap(seed + "|sum", 2.0 * (hi - lo) / epsilon)) /
            greatest(col("__n") + lap(seed + "|cnt", 2.0 / epsilon), lit(1.0)),
          roundTo).as("noisy_mean"): _*)
  }

  /** Distinct-sensitive-value (l-diversity) histogram per QI class:
    * (l, n_classes), ordered — the release's l-diversity is the
    * smallest l. A class of 1000 rows that all share one diagnosis is
    * 1000-anonymous and 1-diverse; this histogram is what catches it.
    * NULL sensitive values count as a value (same attacker model as
    * [[kAnonymityProfile]]); exact distinct per class — two grouped
    * aggregations, no expensive per-class state. */
  def lDiversityProfile(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityProfile: at least one QI column")
    require(!qiCols.contains(sensitiveCol),
      s"lDiversityProfile: sensitive column $sensitiveCol must not be a QI " +
        "(each class would be trivially 1-diverse)")
    val distincts = df
      .select(qiCols.map(col) :+ col(sensitiveCol).as("__s"): _*)
      .distinct()
      .groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("l"))
    distincts.groupBy("l").agg(count(lit(1)).as("n_classes")).orderBy("l")
  }
}
