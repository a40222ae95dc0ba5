package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint verification — the corpus QA
  * step a training pipeline runs before anything trains on a new drop
  * (the idea popularized by the unit-testing-for-data literature, e.g.
  * Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018): measure completeness / cardinality / bounds per column in
  * ONE pass, then assert machine-checkable expectations against the
  * measurements, so a half-written parquet drop or a scraper that
  * started emitting nulls fails the gate instead of poisoning a run.
  */
object Profile {

  /** Caller-supplied column names are interpolated into `stack(...)`
    * SQL below; escape the two metacharacters so a name containing a
    * backtick or quote profiles cleanly instead of dying in the parser
    * (matches [[Funnel.cohortRetention]]'s tsCol escaping). */
  private def sqlName(c: String): String = "`" + c.replace("`", "``") + "`"
  private def sqlLit(c: String): String =
    "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Per-column profile over ONE aggregation pass: for each column its
    * non-null count, completeness (non-null fraction), exact distinct
    * count, and min/max rendered as strings (the uniform cross-type
    * schema). Output: (column, n_rows, n_nonnull, completeness,
    * n_distinct, min_value, max_value), one row per profiled column.
    *
    * Scale shape: a single aggregation traverses the table once; the
    * multiple exact COUNT(DISTINCT)s make Catalyst plan an Expand (one
    * stream replica per distinct aggregate) — the audit-grade choice,
    * gated in SQL. `approxDistinct = true` swaps in
    * approx_count_distinct (HLL, one stream, no Expand) — the routine
    * 100 TB profile where ±2% cardinality is fine and the oracle gate
    * does not apply. Everything after the one pass is a 1-row frame
    * unpivoted driver-side-free via `stack`. */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false,
      roundTo: Int = 4): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    // see sqlName/sqlLit: caller-supplied names are escaped before SQL
    // interpolation so a backtick/quote yields data, not a parse error
    def distinctAgg(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c))
      else count_distinct(col(c))
    val aggs = count(lit(1)).as("n_rows_") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        distinctAgg(c).as(s"${c}__d"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"${sqlLit(c)}, ${sqlName(c + "__n")}, ${sqlName(c + "__d")}, " +
        s"${sqlName(c + "__min")}, ${sqlName(c + "__max")}").mkString(", ")
    row.select(
        expr(s"stack(${cols.size}, $stackArgs) " +
          "as (column, n_nonnull, n_distinct, min_value, max_value)"),
        col("n_rows_"))
      .select(col("column"), col("n_rows_").as("n_rows"), col("n_nonnull"),
        round(col("n_nonnull").cast("double") / col("n_rows_"), roundTo)
          .as("completeness"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Per-column heavy hitters: the k most frequent values of each
    * profiled column, with counts — the skew audit run BEFORE a join or
    * groupBy ships (a key taking >1/parallelism of the table forces the
    * salted-join / AQE-skew path; this is how you find out on day 0, not
    * from a straggler task at hour 3). Also the enum-drift eye: a
    * "lang" column whose top value changed week-over-week is a scraper
    * incident.
    *
    * Scale shape: ONE pass — each row explodes to (column, value)
    * string pairs via `stack` (cols× amplification, map-side combined
    * immediately), one (column, value) aggregation, then the heap
    * operator trims to k per column BEFORE the exchange
    * ([[graft.plans.TopK.perKey]] — k·partitions rows move, never the
    * value histogram). (count DESC, value) totally orders, so the cut
    * at k is deterministic. Output: (column, value, n, rank). */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty, "at least one column to audit")
    val stackArgs =
      cols.map(c => s"${sqlLit(c)}, cast(${sqlName(c)} as string)").mkString(", ")
    val counts = df
      .select(expr(s"stack(${cols.size}, $stackArgs) as (column, value)"))
      .where(col("value").isNotNull)
      .groupBy("column", "value").agg(count(lit(1)).as("n"))
    graft.plans.TopK.perKey(counts,
      Seq(col("column")), Seq(col("n").desc, col("value")), k)
  }

  /** Profile DRIFT between two snapshots of the same table — the
    * metric-level recrawl audit ([[Changes.snapshotDelta]] classifies
    * ROWS; this compares the MEASUREMENTS): per column, both profiles
    * side by side plus the deltas a monitor alerts on — row-count
    * ratio, completeness delta, distinct-count ratio. A scraper that
    * started emitting nulls moves completeness_delta; an enum column
    * exploding moves distinct_ratio; a half-written drop moves
    * n_rows_ratio. Ratios are genuine quotients rounded to `roundTo`
    * (cross-engine safe); a column absent/empty on one side yields a
    * NULL ratio — surfaced, not defaulted.
    *
    * Scale shape: two single-pass [[profile]] aggregations (one per
    * snapshot) joined on the columns-sized frame. */
  def diff(
      before: DataFrame,
      after: DataFrame,
      cols: Seq[String],
      roundTo: Int = 4): DataFrame = {
    val b = profile(before, cols, roundTo = roundTo)
      .select(col("column"), col("n_rows").as("n_rows_before"),
        col("completeness").as("completeness_before"),
        col("n_distinct").as("n_distinct_before"))
    val a = profile(after, cols, roundTo = roundTo)
      .select(col("column"), col("n_rows").as("n_rows_after"),
        col("completeness").as("completeness_after"),
        col("n_distinct").as("n_distinct_after"))
    b.join(a, Seq("column"))
      .select(col("column"),
        col("n_rows_before"), col("n_rows_after"),
        when(col("n_rows_before") > 0,
          round(col("n_rows_after").cast("double") / col("n_rows_before"), roundTo))
          .as("n_rows_ratio"),
        col("completeness_before"), col("completeness_after"),
        round(col("completeness_after") - col("completeness_before"), roundTo)
          .as("completeness_delta"),
        col("n_distinct_before"), col("n_distinct_after"),
        when(col("n_distinct_before") > 0,
          round(col("n_distinct_after").cast("double") / col("n_distinct_before"),
            roundTo)).as("distinct_ratio"))
  }

  /** A machine-checkable expectation against one profiled column. */
  sealed trait Constraint { def column: String; def describe: String }
  /** Non-null fraction ≥ `atLeast`. */
  case class Complete(column: String, atLeast: Double = 1.0) extends Constraint {
    def describe = s"completeness($column) >= $atLeast"
  }
  /** Every non-null value distinct (a key column). */
  case class Unique(column: String) extends Constraint {
    def describe = s"unique($column)"
  }
  /** Distinct count within [lo, hi] — catches an enum column exploding
    * (scraper breakage) or collapsing (a constant-filled drop). */
  case class DistinctBetween(column: String, lo: Long, hi: Long) extends Constraint {
    def describe = s"n_distinct($column) in [$lo, $hi]"
  }

  /** Evaluate constraints against [[profile]]'s measurements: one row
    * per constraint — (column, constraint, passed, observed). The table
    * is traversed ONCE (every constraint reads the single profile pass:
    * the verdicts are one join of the columns-sized profile frame
    * against a constraints-sized literal frame — a per-constraint
    * filter-and-union would re-plan the aggregation per constraint). */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._
    val prof = profile(df, constraints.map(_.column).distinct)
    val cdf = constraints.map {
      case c @ Complete(n, atLeast) => (n, "complete", atLeast, 0L, 0L, c.describe)
      case c @ Unique(n) => (n, "unique", 0.0, 0L, 0L, c.describe)
      case c @ DistinctBetween(n, lo, hi) =>
        (n, "distinct_between", 0.0, lo, hi, c.describe)
    }.toDF("column", "kind_", "p_frac_", "p_lo_", "p_hi_", "constraint")
    prof.join(cdf, "column")
      .select(col("column"), col("constraint"),
        when(col("kind_") === "complete", col("completeness") >= col("p_frac_"))
          .when(col("kind_") === "unique", col("n_distinct") === col("n_nonnull"))
          .otherwise(col("n_distinct").between(col("p_lo_"), col("p_hi_")))
          .as("passed"),
        when(col("kind_") === "complete", col("completeness").cast("string"))
          .when(col("kind_") === "unique",
            concat_ws("/", col("n_distinct"), col("n_nonnull")))
          .otherwise(col("n_distinct").cast("string")).as("observed"))
  }

  /** Referential-integrity audit — the FOREIGN-KEY constraint the
    * [[Constraint]] family lacks (completeness/uniqueness/cardinality
    * are single-table facts; orphaned children are a JOIN fact, and the
    * silent killer of star-schema pipelines: an orphan row vanishes
    * from every inner join downstream without an error anywhere). One
    * row per checked relationship: child rows, distinct child keys,
    * orphan rows (child keys absent from the parent), orphan share,
    * and the verdict.
    *
    * NULL child keys are counted separately (`null_keys`) and are NOT
    * orphans — SQL FK semantics: a NULL reference is absent, not
    * dangling; completeness is [[profile]]'s dimension.
    *
    * Scale shape: one left-anti join per relationship on the key (the
    * parent side reduced to DISTINCT keys first — keys-sized, broadcast
    * when small) + one aggregation. */
  def referentialIntegrity(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String,
      relation: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val base = child.select(col(childKey).as("__ck"))
    val nonNull = base.where(col("__ck").isNotNull)
    val orphans = nonNull
      .join(keys, nonNull("__ck") === keys("__pk"), "left_anti")
    val stats = base.agg(
      count(lit(1)).as("child_rows"),
      count(col("__ck")).as("non_null_keys"),
      countDistinct(col("__ck")).as("distinct_keys"))
    val o = orphans.agg(
      count(lit(1)).as("orphan_rows"),
      countDistinct(col("__ck")).as("orphan_keys"))
    stats.crossJoin(broadcast(o))
      .select(lit(relation).as("relation"),
        col("child_rows"),
        (col("child_rows") - col("non_null_keys")).as("null_keys"),
        col("distinct_keys"), col("orphan_rows"), col("orphan_keys"),
        when(col("non_null_keys") > 0,
          round(col("orphan_rows") * lit(1.0) / col("non_null_keys"), 6))
          .otherwise(lit(0.0)).as("orphan_share"),
        (col("orphan_rows") === 0).as("intact"))
  }

  /** Approximate functional-dependency audit (the g₃ error of Kivinen &
    * Mannila 1995 — the standard "how far is det → dep from holding"
    * measure: the minimum number of rows to delete so the FD holds
    * exactly). The profiler tier above [[referentialIntegrity]]: FK
    * audits check keys BETWEEN tables, this checks determinations WITHIN
    * one — candidate keys (g₃ = 0 with dep = any other column), derived
    * columns that should be redundant, and "almost-FDs" whose violations
    * are usually ingest defects (one source stamping the wrong lang for
    * 2% of docs).
    *
    * Semantics: rows with NULL determinant are excluded (an FD
    * constrains rows that HAVE a determinant value); NULL dependents
    * count as a value (two NULLs agree — the SQL GROUP BY convention
    * both engines share). g₃ = Σ_groups (group size − its plurality-
    * value count); all integer arithmetic.
    *
    * Scale shape: one (det, dep) aggregation (map-side combined), one
    * det-keyed reduction, one 1-row fold — the value-pair frame is the
    * only shuffle, bounded by the distinct pair count, never raw rows
    * twice. Output (1 row): relation, n_rows, n_groups, n_pairs,
    * g3_violations, g3_rate (round 6), holds. */
  def functionalDependency(
      df: DataFrame,
      detCol: String,
      depCol: String,
      relation: String): DataFrame = {
    val pairs = df.where(col(detCol).isNotNull)
      .groupBy(col(detCol).as("__a"), col(depCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val perDet = pairs.groupBy("__a").agg(
      sum(col("__c")).as("__n"),
      max(col("__c")).as("__mx"),
      count(lit(1)).as("__np"))
    perDet.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(col("__np")).as("n_pairs"),
        (sum(col("__n")) - sum(col("__mx"))).as("g3_violations"))
      .select(lit(relation).as("relation"),
        col("n_rows"), col("n_groups"), col("n_pairs"),
        col("g3_violations"),
        when(col("n_rows") > 0,
          round(col("g3_violations") * lit(1.0) / col("n_rows"), 6))
          .otherwise(lit(0.0)).as("g3_rate"),
        (col("g3_violations") === 0).as("holds"))
  }

  /** Semi-structured schema-drift ledger — the key LIFECYCLE of a JSON
    * payload column: per key, occurrence count, first/last day seen,
    * days present, day coverage, and the two drift verdicts (`appeared`
    * = first seen after the corpus's first day, `vanished` = last seen
    * before its last). The monitor that catches a producer silently
    * adding, renaming, or dropping payload fields — the schemaless
    * counterpart of [[diff]]'s typed-column drift.
    *
    * A key-level ledger, deliberately NOT a day-over-day diff: the diff
    * needs an ordered walk over the day frame (a global window), while
    * the lifecycle is plain grouped min/max/count — no window at all,
    * and the appeared/vanished read is the same. Malformed JSON rows
    * parse to NULL and contribute no keys (they are [[profile]]'s
    * completeness problem, not a schema signal).
    *
    * Scale shape: one parse+explode projection, one (key) aggregation
    * with map-side combining (keys are schema-sized), one 1-row corpus
    * frame broadcast back. */
  def jsonKeyLifecycle(
      df: DataFrame,
      day: Column,
      json: Column,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val keys = df.where(json.isNotNull && day.isNotNull)
      .select(day.as("day"),
        explode_outer(map_keys(
          from_json(json, MapType(StringType, StringType)))).as("key"))
      .where(col("key").isNotNull)
    val perKey = keys.groupBy("key").agg(
      count(lit(1)).as("n_events"),
      min("day").as("first_seen"), max("day").as("last_seen"),
      countDistinct("day").as("days_present"))
    val corpus = keys.agg(min("day").as("__d0"), max("day").as("__d1"),
      countDistinct("day").as("__nd"))
    perKey.crossJoin(broadcast(corpus))
      .select(col("key"), col("n_events"), col("first_seen"),
        col("last_seen"), col("days_present"),
        round(col("days_present") * lit(1.0) / col("__nd"), roundTo)
          .as("day_coverage"),
        (col("first_seen") > col("__d0")).as("appeared"),
        (col("last_seen") < col("__d1")).as("vanished"))
      .orderBy("key")
  }

  /** Mass-concentration audit — Gini coefficient + top-share cuts of a
    * weight distribution over groups (the domain-concentration read
    * every corpus mix review makes: "what fraction of tokens come from
    * the top source?"; a Gini near 1 means a handful of domains ARE the
    * corpus, near 0 a flat mix). Uses the exact rank formula over
    * ascending group mass
    *   G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    * (i = 1-based ascending rank, ties broken by the group key — a
    * total order, so the statistic is deterministic).
    *
    * Output one row: (n_groups, total, gini, top1_share,
    * top_decile_share) — top decile = the ⌈n/10⌉ heaviest groups.
    *
    * Determinism: weights cast to integral, Σx and Σi·x accumulate in
    * exact decimal, the final combination is one fixed-order double
    * expression, rounded. Groups with NULL keys are excluded; negative
    * weights are rejected row-wise via the integral cast contract
    * (callers pass counts).
    *
    * Scale shape: ONE corpus aggregation to the groups frame; ranking
    * rides [[Packing.withGlobalOffset]]'s two-pass range exchange (no
    * single-task global window even on a pathological group count);
    * the final stats are two aggregations OF the groups frame plus a
    * 1-row broadcast. */
  def concentration(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 0)
    val g = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k"))
      .agg(sum(weight.cast("long")).as("x"))
      .withColumn("__one", lit(1L))
    val ranked = Packing.withGlobalOffset(g, Seq("x", "k"), "__one", "__idx")
    val stats = ranked.agg(
      count(lit(1)).as("n_groups"),
      sum(col("x").cast(DEC)).as("tot"),
      sum(col("x").cast(DEC) * (col("__idx") + 1).cast(DEC)).as("iwx"),
      max(col("x")).as("xmax"))
    val n = col("n_groups").cast("double")
    val tot = col("tot").cast("double")
    val topShare = ranked.crossJoin(broadcast(stats.select(
        col("n_groups").as("__n"), col("tot").as("__t"))))
      .where(col("__idx") + 1 > col("__n") - ceil(col("__n") / 10.0))
      .agg(coalesce(sum(col("x").cast(DEC)), lit(0).cast(DEC)).as("topx"),
        first(col("__t")).as("__t2"))
      .select(round(col("topx").cast("double") /
        col("__t2").cast("double"), roundTo).as("top_decile_share"))
    stats.select(
        col("n_groups"), col("tot").cast("long").as("total"),
        when(col("n_groups") > 1 && col("tot") > 0,
          round(lit(2.0) * col("iwx").cast("double") / (n * tot) -
            (n + 1.0) / n, roundTo)).as("gini"),
        when(col("tot") > 0,
          round(col("xmax").cast("double") / tot, roundTo)).as("top1_share"))
      .crossJoin(broadcast(topShare))
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938 — the
    * fraud/fabrication screen every financial and telemetry QA runs):
    * naturally-generated multi-scale magnitudes put digit d first with
    * probability log₁₀(1 + 1/d); fabricated, truncated, or capped data
    * does not. Output: one row per leading digit 1–9 with observed
    * count/share, the Benford expectation, and the digit's χ²
    * contribution `(n_d − N·p_d)² / (N·p_d)` — Σ over the 9 rows is the
    * χ² statistic (8 dof) a caller compares to its threshold.
    *
    * The leading digit comes from the DECIMAL STRING rendering (values
    * cast to `DECIMAL(38,6)` — plain notation in any engine, no
    * E-notation hazard), first `[1-9]` char after sign/zeros/point
    * strip; zero/NULL values carry no leading digit and are excluded
    * from N. Expected shares compute in-engine (`ln(1+1/d)/ln 10`,
    * rounded — the q91 libm-then-round rule), so no literal table has to
    * match across engines. Digits with zero observations still emit
    * (expected > 0 ⟹ a missing digit is χ² evidence, not a missing
    * row). One narrow projection + one 9-bucket aggregation with
    * map-side combining + a 1-row N broadcast. */
  def benfordAudit(
      df: DataFrame,
      valueCol: Column,
      roundTo: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digit = regexp_extract(
      abs(valueCol).cast("decimal(38,6)").cast("string"), "[1-9]", 0)
    val obs = df.select(digit.as("digit"))
      .where(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val digits = broadcast((1 to 9).map(_.toString).toDF("digit"))
    val filled = digits.join(obs, Seq("digit"), "left")
      .select(col("digit").cast("int").as("digit"),
        coalesce(col("n"), lit(0L)).as("n"))
    val tot = filled.agg(sum(col("n")).as("nt"))
    val exp = round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)),
      roundTo)
    filled.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") * lit(1.0) / col("nt"), roundTo).as("obs_share"),
        exp.as("exp_share"),
        // (n − N·p)² / (N·p) over the ROUNDED expectation — one fixed-
        // order double expression, deterministic by IEEE arithmetic
        round(
          (col("n") - col("nt") * exp) * (col("n") - col("nt") * exp) /
            (col("nt") * exp), roundTo).as("chi2_contrib"))
      .orderBy("digit")
  }
}
