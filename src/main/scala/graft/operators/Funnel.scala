package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.types.LongType

/** Ordered event-sequence (funnel) analysis over an event log — the
  * classic product/behavior query (view → click → purchase): how many
  * users complete each PREFIX of the stage sequence IN ORDER, where each
  * stage's event must occur strictly after the user's earliest completion
  * of the previous prefix.
  *
  * Semantics: t₁(u) = min ts of a stage-1 event; tᵢ(u) = min ts of a
  * stage-i event with ts > tᵢ₋₁(u). A user counts for stage i iff tᵢ
  * exists — the earliest-completion chaining rule (greedy is optimal
  * here: taking the earliest possible completion of each prefix can only
  * enlarge the set of events eligible for the next stage, so if ANY
  * in-order assignment completes the funnel, the greedy one does).
  *
  * Scale shape: one column-pruned, predicate-pushed scan of the event
  * log per stage (the `event_type = s` filter reaches the parquet scan;
  * k stages = k cheap scans), each reduced map-side to a users-sized
  * (user, t) frame before its exchange; stage i joins stage i−1's frame
  * by user id. The alternative single-pass shape — collect each user's
  * full sorted event array and fold — shuffles the RAW log once and
  * materializes per-user arrays; k filtered aggregations move strictly
  * less for the small stage counts a funnel has. Scalar rates ride a
  * 1-row broadcast cross join (the q61 class).
  */
object Funnel {

  /** Per-stage funnel counts: (stage_idx, stage, users, rate) with
    * `rate` = users / stage-1 users (rounded, a genuine quotient),
    * ordered by stage_idx. `tsCol` must be orderable (epoch micros). */
  def funnelCounts(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "uts",
      roundTo: Int = 4): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("uts"))
    val stageFrames = stages.foldLeft(List.empty[DataFrame]) { (acc, st) =>
      val base = e.filter(col("et") === st)
      val cur = acc match {
        case Nil => base.groupBy("u").agg(min("uts").as("t"))
        case prev :: _ =>
          base.join(prev.select(col("u"), col("t").as("tp")), Seq("u"))
            .filter(col("uts") > col("tp"))
            .groupBy("u").agg(min("uts").as("t"))
      }
      cur :: acc
    }.reverse
    val counts = stageFrames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).cast(LongType).as("users"))
        .select(lit(i + 1).as("stage_idx"),
          lit(stages.take(i + 1).mkString(">")).as("stage"),
          col("users"))
    }
    val top = counts.head.select(col("users").as("top_"))
    counts.reduce(_ union _)
      .crossJoin(broadcast(top))
      .select(col("stage_idx"), col("stage"), col("users"),
        round(col("users") * lit(1.0) / col("top_"), roundTo).as("rate"))
      .orderBy("stage_idx")
  }

  /** Per-event sessionization: assign every event its (user, session)
    * identity under the gap rule — a new session starts when the time
    * since the user's PREVIOUS event exceeds `gapUs`. The row-level
    * form of T4's session windows (q28 aggregates per session; this
    * labels the events themselves, the shape downstream joins need),
    * completing the events family next to the funnel and retention.
    *
    * Output: input projection + `session` (0-based per user, in time
    * order) and `session_id` (user·2³² + session, a corpus-unique
    * 64-bit label). The arithmetic pack is exact ONLY for a
    * non-negative integral `userCol` < 2³¹ with < 2³² sessions per
    * user: a user id ≥ 2³¹ overflows the Long product (silent
    * collisions), and a non-numeric user column casts to NULL.
    * Callers with string/UUID user keys should derive a surrogate id
    * first (e.g. dense_rank over users) or key downstream work on the
    * (`userCol`, `session`) pair, which is always exact — the pack
    * exists so the SQL-oracle replay has a single comparable column.
    * Ties on ts within a user are one session (gap 0 ≤ gap).
    *
    * Scale shape: ONE window over (user, ts) — partitioned by user,
    * which is the WELL-distributed key (millions of users, bounded
    * events each), unlike the per-source windows the grouped prefix sum
    * exists for; lag + a running conditional sum inside the same window
    * spec = one shuffle total. */
  def sessionize(
      events: DataFrame,
      gapUs: Long,
      userCol: String = "user_id",
      tsCol: String = "uts"): DataFrame = {
    require(gapUs >= 1L, s"gapUs $gapUs must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val newSession =
      when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("session",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id",
        col(userCol).cast(LongType) * lit(1L << 32) + col("session"))
  }

  /** Top-k event paths: the most common length-`n` consecutive
    * event-type sequences across sessions — the third behavioral
    * classic after the funnel (a KNOWN sequence) and retention: paths
    * DISCOVER the sequences users actually take ("view>view>click"
    * outnumbering "view>click>purchase" is the drop-off diagnosis).
    * Sessions come from [[sessionize]]'s gap rule, so cross-session
    * gaps never fabricate a path.
    *
    * Output: (path, n) — the top `k` under the (n DESC, path) total
    * order, path a ">"-joined type sequence.
    *
    * Scale shape: one (session_id) aggregation collects each session's
    * (ts, id, type) triples — sessions are bounded (a user's events in
    * one gap-window), so per-group state is small where a per-USER
    * collect would not be; the per-session sort + n-gram extraction is
    * a narrow per-row map (deterministic under the (ts, event_id)
    * total order), then one path-count aggregation and a TakeOrdered
    * heap. The event log shuffles once, as (session, triple) pairs. */
  def topPaths(
      events: DataFrame,
      gapUs: Long,
      n: Int = 3,
      k: Int = 20,
      userCol: String = "user_id",
      idCol: String = "event_id",
      typeCol: String = "event_type",
      tsCol: String = "uts"): DataFrame = {
    require(n >= 1, s"path length $n must be >= 1")
    require(k >= 1, s"k $k must be >= 1")
    val sess = sessionize(events, gapUs, userCol, tsCol)
      .select(col("session_id"),
        struct(col(tsCol).as("ts"), col(idCol).as("id"), col(typeCol).as("et"))
          .as("ev"))
      .groupBy("session_id")
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
    val types = transform(col("evs"), e => e.getField("et"))
    val paths = when(size(col("evs")) >= n,
        transform(sequence(lit(1), size(col("evs")) - (n - 1)),
          i => concat_ws(">", slice(types, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    sess.select(explode(paths).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention — the funnel's sibling: bucket each user into the
    * cohort of their FIRST event (floor(ts / bucket)), then for each
    * (cohort, offset k) count users with ANY event in cohort + k buckets
    * and the retention rate against the cohort's size. The
    * who-comes-back curve every activity dashboard starts with.
    *
    * Output: (cohort, k, active_users, cohort_users, retention) for
    * every (cohort, k) pair with activity, ordered. k = 0 rows equal the
    * cohort size by construction (the first event is itself activity).
    *
    * Scale shape: one aggregation to the (user, cohort) first-event
    * frame; one distinct over (user, bucket) — both users-×-buckets
    * sized, both map-side combining; one user-keyed join between them
    * and a (cohort, k) count. The raw log is scanned once per frame and
    * never shuffled whole. `tsCol` must be NON-NEGATIVE epoch micros:
    * `DIV` (like DuckDB's `//`) truncates toward zero, so pre-1970
    * timestamps would fold buckets −1 and 0 together — out of contract
    * here, not silently floored. */
  def cohortRetention(
      events: DataFrame,
      bucketUs: Long,
      userCol: String = "user_id",
      tsCol: String = "uts",
      roundTo: Int = 4): DataFrame = {
    require(bucketUs >= 1L, s"bucketUs $bucketUs must be >= 1")
    // integer DIV, not float-divide-then-floor: exact for the full
    // non-negative epoch range (floats lose integers past 2^53)
    val ts = "`" + tsCol.replace("`", "``") + "`"
    val e = events.select(col(userCol).as("u"),
      expr(s"CAST($ts AS BIGINT) DIV ${bucketUs}L").as("b"))
    val first = e.groupBy("u").agg(min("b").as("cohort"))
    val active = e.distinct()
    val cohortSizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    active.join(first, Seq("u"))
      .filter(col("b") >= col("cohort"))
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("active_users"))
      .join(cohortSizes, Seq("cohort"))
      .select(col("cohort"), col("k"), col("active_users"), col("cohort_users"),
        round(col("active_users") * lit(1.0) / col("cohort_users"), roundTo)
          .as("retention"))
      .orderBy("cohort", "k")
  }

  /** Ingest-rate anomaly detection: bucket the event stream, z-score
    * each bucket's count against the corpus of buckets, flag |z| ≥
    * `zThreshold` — the monitoring query every ingest dashboard runs
    * (a scraper outage is a low spike, a bot flood or replay is a high
    * one). The time-series counterpart of the corpus drift monitors
    * ([[Quality]]'s KL family watches DISTRIBUTIONS; this watches
    * VOLUME).
    *
    * Determinism: mean and variance come from EXACT integer moments —
    * Σx and Σx² over the bucket counts, variance =
    * (n·Σx² − (Σx)²) / (n·(n−1)) — never from engine `stddev`, whose
    * streaming accumulation (Welford vs two-pass) differs across
    * engines in late digits; z is then one double quotient over a sqrt
    * (continuous, safe to round) computed from identical exact inputs.
    * The moments accumulate in DECIMAL(38,0), not BIGINT: Σx² and
    * (Σx)² cross 2⁶³ at ~3·10⁹ total events — routine at the ingest
    * scale this monitors — where BIGINT arithmetic would THROW under
    * Spark 4's default ANSI mode (and silently wrap with ANSI off);
    * decimal(38) is exact to 10³⁸, far past any real event volume.
    *
    * Null timestamps are EXCLUDED before bucketing (a null has no
    * window; folding nulls into a pseudo-bucket would z-score the
    * scraper's error rows as ingest volume).
    *
    * Output: (bucket, n, z, anomalous), bucket = epoch-micros window
    * start, ordered. Degenerate corpora (≤1 bucket, or all buckets
    * equal ⇒ zero variance) yield z = NULL / anomalous = false —
    * surfaced, not flagged.
    *
    * Scale shape: ONE aggregation to the buckets frame (map-side
    * combining; buckets ≪ events), then a 1-row stats frame broadcast
    * back over it (the q61 one-row-crossJoin class). The raw log is
    * scanned once and never shuffled whole. Same non-negative-micros
    * DIV contract as [[cohortRetention]]. */
  def rateAnomalies(
      events: DataFrame,
      bucketUs: Long,
      tsCol: String = "uts",
      zThreshold: Double = 2.0,
      roundTo: Int = 4): DataFrame = {
    require(bucketUs >= 1L, s"bucketUs $bucketUs must be >= 1")
    require(zThreshold > 0.0, s"zThreshold $zThreshold must be > 0")
    import org.apache.spark.sql.types.DecimalType
    val ts = "`" + tsCol.replace("`", "``") + "`"
    // referenced twice (stats aggregate + probe side of the crossJoin):
    // persist so the events scan/aggregation genuinely runs once instead
    // of relying on exchange reuse to kick in; released on every exit
    // path — the output (bucket-sized, ≪ events) is materialized
    // lineage-free first, so callers never pin the cache
    val buckets = events
      .where(col(tsCol).isNotNull)
      .select(expr(s"(CAST($ts AS BIGINT) DIV ${bucketUs}L) * ${bucketUs}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val nd = col("n").cast(DecimalType(38, 0))
      val stats = buckets.agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("nb"),
        sum(nd).as("sx"),
        sum(nd * nd).as("sxx"))
      val z = (nd * col("nb") - col("sx")).cast("double") /
        (col("nb").cast("double") * sqrt(
          (col("nb") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("nb") * (col("nb") - lit(1))).cast("double")))
      buckets.crossJoin(broadcast(stats))
        .select(col("bucket"), col("n"),
          when(col("nb") > 1 && (col("nb") * col("sxx") =!= col("sx") * col("sx")),
            round(z, roundTo)).as("z"))
        .withColumn("anomalous", coalesce(abs(col("z")) >= zThreshold, lit(false)))
        .orderBy("bucket")
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    } finally buckets.unpersist()
  }

  /** Session transition matrix — first-order Markov estimates of "what
    * happens next": per (from, to) consecutive event-type pair WITHIN a
    * session, the count and the row-normalized transition probability
    * (the model behind next-step prediction, anomaly scoring of event
    * streams, and the drop-off reading [[topPaths]] gives by example —
    * paths enumerate FREQUENT sequences, this estimates the full
    * conditional). Session boundaries come from the caller (usually
    * [[sessionize]]'s `session_id`), so cross-session gaps never
    * fabricate a transition — the [[topPaths]] rule.
    *
    * Determinism: consecutive pairs order by (ts, idCol) — a total
    * order; probabilities are genuine quotients, rounded.
    *
    * Scale shape: one window pass over the session key (bounded
    * partitions by the sessionization contract) to form pairs, one
    * (from, to) aggregation with map-side combining to the model-sized
    * cells frame, from-totals aggregate THE CELLS and broadcast back. */
  def transitionMatrix(
      events: DataFrame,
      sessionCol: String = "session_id",
      typeCol: String = "event_type",
      tsCol: String = "uts",
      idCol: String = "event_id",
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sessionCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(sessionCol), col(typeCol).as("to_"), col(tsCol), col(idCol))
      .withColumn("from_", lag(col("to_"), 1).over(w))
      .where(col("from_").isNotNull)
    val cells = pairs.groupBy(col("from_"), col("to_"))
      .agg(count(lit(1)).as("n"))
    val fromTot = cells.groupBy("from_").agg(sum("n").as("from_total"))
    cells.join(broadcast(fromTot), "from_")
      .select(col("from_").as("from_type"), col("to_").as("to_type"),
        col("n"),
        round(col("n") * lit(1.0) / col("from_total"), roundTo).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Association rules over session itemsets — support / confidence /
    * lift for event-type pairs (the market-basket classics: "sessions
    * that ERROR also PURCHASE?" is a lift question; the
    * [[transitionMatrix]] is ORDER-sensitive and adjacent-only, this is
    * co-occurrence at session scope): a session's itemset is its
    * DISTINCT event types, and for each ordered pair (a → c),
    * support = P(a,c), confidence = P(c|a), lift = P(c|a)/P(c). Rules
    * below `minSupport` are cut (the Apriori pruning step — support is
    * anti-monotone, so low-support pairs can never parent a keepable
    * longer rule either).
    *
    * Scale shape: the event log collapses to DISTINCT (session, type)
    * first (map-side combined); the pair self-join is session-keyed
    * with fan-out bounded by the TYPE VOCABULARY per session (never
    * events²); singles totals are vocabulary-sized broadcasts and the
    * session count a 1-row broadcast. Quotients round at `roundTo` —
    * genuine ratios, cross-engine safe. */
  def associationRules(
      events: DataFrame,
      sessionCol: String = "session_id",
      typeCol: String = "event_type",
      minSupport: Double = 0.0,
      roundTo: Int = 6): DataFrame = {
    require(minSupport >= 0.0 && minSupport <= 1.0,
      s"associationRules: minSupport $minSupport outside [0,1]")
    val items = events.select(col(sessionCol).as("sid"), col(typeCol).as("it"))
      .where(col("sid").isNotNull && col("it").isNotNull)
      .distinct()
    val nSessions = items.select("sid").distinct()
      .agg(count(lit(1)).as("__n"))
    val singles = items.groupBy(col("it")).agg(count(lit(1)).as("n_one"))
    val half = items.select(col("sid"), col("it").as("a"))
      .join(items.select(col("sid"), col("it").as("c")), "sid")
      .where(col("a") < col("c"))
      .groupBy("a", "c").agg(count(lit(1)).as("n_ab"))
    val both = half.unionByName(
      half.select(col("c").as("a"), col("a").as("c"), col("n_ab")))
    both
      .join(broadcast(singles.select(col("it").as("a"), col("n_one").as("n_a"))), "a")
      .join(broadcast(singles.select(col("it").as("c"), col("n_one").as("n_c"))), "c")
      .crossJoin(broadcast(nSessions))
      .where(col("n_ab") * lit(1.0) / col("__n") >= minSupport)
      .select(col("a").as("antecedent"), col("c").as("consequent"),
        col("n_ab"),
        round(col("n_ab") * lit(1.0) / col("__n"), roundTo).as("support"),
        round(col("n_ab") * lit(1.0) / col("n_a"), roundTo).as("confidence"),
        round((col("n_ab") * lit(1.0) / col("n_a")) /
          (col("n_c") * lit(1.0) / col("__n")), roundTo).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  /** Multi-touch attribution — the classic first-touch / last-touch /
    * linear credit models over conversion journeys, in one pass: every
    * non-conversion event ("touch") belongs to the journey of its
    * user's NEXT conversion (the standard conversion-window rule:
    * journeys reset at each conversion; touches after the last
    * conversion are unattributed and dropped by the inner join — they
    * have not converted yet). Per channel (the event type), the three
    * credit totals; a channel's first/last credit counts journeys it
    * opened/closed, linear splits each journey's unit credit evenly.
    *
    * Determinism: journeys and first/last ranks order by (ts, idCol) —
    * a TOTAL order (idCol unique), so ties on ts cannot flip credits
    * between runs or engines; linear credits (1/n — small-integer
    * quotients, exactly representable or far from decimal ties) enter
    * DECIMAL(28,14) before the channel sum, so the total is
    * partition-order-free (the house drift-family accumulation rule).
    * NULL users/timestamps are excluded (no journey identity).
    *
    * Scale shape: one window pass over (user) — the well-distributed
    * key — for conversion numbering, one co-keyed (user, conv_no) join
    * of touches to their conversion (both sides arrive hash-partitioned
    * by user from the same exchange), one bounded journey window (a
    * user's touches between two conversions), one channel aggregation
    * with map-side combining. No driver state. */
  def attribution(
      events: DataFrame,
      conversionType: String,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "uts",
      idCol: String = "event_id",
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val wRun = Window.partitionBy(col("u")).orderBy(col("ts"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("ch"),
        col(tsCol).as("ts"), col(idCol).as("eid"))
      .withColumn("is_conv",
        (col("ch") === conversionType).cast("int"))
      .withColumn("conv_run", sum(col("is_conv")).over(wRun))
    val touches = e.where(col("is_conv") === 0)
      .select(col("u"), col("ch"), col("ts"), col("eid"),
        (col("conv_run") + 1).as("conv_no"))
    val convs = e.where(col("is_conv") === 1)
      .select(col("u"), col("conv_run").as("conv_no"))
    val wj = Window.partitionBy(col("u"), col("conv_no"))
    val ranked = touches.join(convs, Seq("u", "conv_no"))
      .withColumn("n", count(lit(1)).over(wj))
      .withColumn("rn_a",
        row_number().over(wj.orderBy(col("ts"), col("eid"))))
      .withColumn("rn_d",
        row_number().over(wj.orderBy(col("ts").desc, col("eid").desc)))
    ranked.groupBy(col("ch").as(typeCol))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("u"), col("conv_no")).as("n_journeys"),
        sum(when(col("rn_a") === 1, 1L).otherwise(0L)).cast(LongType)
          .as("credit_first"),
        sum(when(col("rn_d") === 1, 1L).otherwise(0L)).cast(LongType)
          .as("credit_last"),
        round(sum((lit(1.0) / col("n")).cast(DecimalType(28, 14)))
          .cast("double"), roundTo).as("credit_linear"))
      .orderBy(typeCol)
  }

  /** Kaplan–Meier survival estimate (Kaplan & Meier 1958) over user
    * lifetimes — the censoring-correct retention curve: a user still
    * active on the corpus's last observed bucket has NOT churned, only
    * been observed so far (right-censoring), and dividing churns by all
    * users (the naive rate) biases retention DOWN exactly where the
    * product-limit estimator stays honest.
    *
    * Semantics: lifetime t = last − first bucket + 1 per user; a user
    * whose last bucket is the corpus frontier is censored at t, others
    * churn at t. S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with nᵢ = users whose
    * lifetime ≥ tᵢ (censored included — they were at risk). Curves are
    * keyed by first-bucket cohort (`cohortBuckets` wide), so the running
    * product is a COHORT-KEYED window, never a global one.
    *
    * Engine-portable determinism: dᵢ/nᵢ are exact integers; the cohort
    * key is exact int64 floor division ([[ZOrder.floorDiv]], matching
    * SQL `//` — never Column `/`, which widens to double); each step's
    * ln survival factor computes in double and rounds into
    * DECIMAL(28,14) before the cumulative sum (the q91 ln-accumulation
    * rule), and S = exp(Σ) rounds to `roundTo`. The SQL replay must
    * CAST its windowed n_risk arithmetic back to BIGINT — DuckDB
    * widens window SUM(BIGINT) to HUGEINT, which renders as a float in
    * the comparator even when every value is integral (the r12 q213
    * hash mismatch). Cohort extinction
    * (dᵢ = nᵢ → factor 0, ln −∞) is handled explicitly: S pins to 0 from
    * that step on — never a NULL-swallowed −Inf.
    *
    * Scale shape: one (user) aggregation over the event log (map-side
    * combined), a 1-row frontier broadcast, then all math on the
    * users-sized then duration-sized frames; the window sorts cohort
    * curves (≤ buckets rows each).
    *
    * Output: (cohort, t, n_risk, n_churned, n_censored, survival). */
  def kaplanMeier(
      df: DataFrame,
      userCol: String,
      tsUsCol: String,
      bucketUs: Long = 86400000000L,
      cohortBuckets: Long = 7L,
      roundTo: Int = 6): DataFrame = {
    require(bucketUs >= 1L, s"bucketUs $bucketUs must be >= 1")
    require(cohortBuckets >= 1L, s"cohortBuckets $cohortBuckets must be >= 1")
    val D = DecimalType(28, 14)
    val days = df.select(col(userCol).as("u"),
        expr(s"CAST($tsUsCol AS BIGINT) DIV ${bucketUs}L").as("d"))
      .where(col("u").isNotNull && col("d").isNotNull)
    val ul = days.groupBy("u").agg(min(col("d")).as("f"), max(col("d")).as("l"))
    val frontier = days.agg(max(col("d")).as("__mx"))
    val lives = ul.crossJoin(broadcast(frontier))
      .select(ZOrder.floorDiv(col("f"), lit(cohortBuckets)).as("cohort"),
        (col("l") - col("f") + 1).as("t"),
        (col("l") === col("__mx")).as("censored"))
    val byT = lives.groupBy("cohort", "t").agg(
      count(when(!col("censored"), lit(1))).as("n_churned"),
      count(when(col("censored"), lit(1))).as("n_censored"))
    val wRisk = Window.partitionBy("cohort").orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy("cohort")
    val withRisk = byT.withColumn("__gone",
        sum(col("n_churned") + col("n_censored")).over(wRisk))
      .withColumn("n_risk",
        sum(col("n_churned") + col("n_censored")).over(total)
          - col("__gone") + col("n_churned") + col("n_censored"))
    val lnStep = when(col("n_churned") === col("n_risk"), lit(null))
      .otherwise(log((col("n_risk") - col("n_churned"))
        .cast("double") / col("n_risk").cast("double")).cast(D))
    val scored = withRisk
      .withColumn("__ln", lnStep)
      .withColumn("__extinct",
        max(when(col("n_churned") === col("n_risk"), 1L).otherwise(0L))
          .over(wRisk))
      .withColumn("survival",
        when(col("__extinct") === 1L, lit(0.0))
          .otherwise(round(exp(sum(col("__ln")).over(wRisk).cast("double")),
            roundTo)))
    scored.select(col("cohort"), col("t"), col("n_risk"),
      col("n_churned"), col("n_censored"), col("survival"))
  }
}
