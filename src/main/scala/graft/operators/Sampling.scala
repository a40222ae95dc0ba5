package graft.operators

import graft.expressions.AsciiPolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Deterministic corpus sampling — the selection half of a training-data
  * pipeline (domain mixing, source re-weighting, train/holdout splits).
  *
  * Why not `df.sample(fraction)`: Spark's sampler draws per-partition RNG
  * streams, so the selected row SET changes with partitioning, task
  * retries, and scale-up — a re-run of the same pipeline on the same data
  * ships a different corpus, and no other engine can reproduce the split.
  * Hash-gated sampling instead derives each row's fate from its stable id:
  * keep iff `polyhash(id ++ salt) mod B < fraction·B`. Properties:
  *
  *  - deterministic and engine-portable (the [[AsciiPolyHash]] fold is
  *    plain integer arithmetic, replayable in any SQL engine);
  *  - a pure narrow filter — no shuffle, no RNG state, pushes down to the
  *    scan like any predicate, trivially correct at any parallelism;
  *  - consistent across tables: the same id draws the same bucket
  *    everywhere, so sampling two fact tables by a shared key yields
  *    JOINABLE samples (per-partition RNG cannot do that);
  *  - `salt` decorrelates: different salts give independent samples
  *    (rerolls), the same salt gives nested samples — `fraction = 0.1` is
  *    a subset of `fraction = 0.2` at equal salt, which is exactly what
  *    incremental scale-up runs want.
  *
  * Bucket granularity is 1/10000: fractions are honored to 0.01%.
  */
object Sampling {

  /** Bucket count — fractions quantize to 1/B. */
  val Buckets = 10000L

  private val P = 1000000007L
  // ~sqrt(P·Buckets)-sized odd constants: the finalizer's product spans
  // ~1e17, i.e. ~1e8 wraps of P, regardless of how small h is
  private val MixA = 479001599L
  private val MixB = 987654323L

  /** The row's stable sampling bucket in [0, B): polyhash of the id
    * rendered as a string (cross-engine canonical form) plus the salt,
    * then an avalanche finalizer `((h+A)·(h+B)) mod P` before the bucket
    * mod. The finalizer matters: short keys (a 3-digit id) fold to h in
    * the tens of thousands, so `h mod B` alone would barely wrap and the
    * low buckets would over-select (an 80% split drew 60% on small-int
    * ids). The quadratic blow-up pushes every key through ~1e8 mod-P
    * wraps; all arithmetic stays < 2^63, exact in any engine's int64. */
  def bucket(idCol: Column, salt: String = ""): Column =
    avalanche(idCol, salt) % Buckets

  /** The avalanched hash WITHOUT the bucket quantization — ~1e9 distinct
    * values. Sampling rates only need 1/10000 granularity ([[bucket]]);
    * shard COUNTS and permutation ORDER keys must not collapse to 10⁴
    * values (a 100 TB export wants ~10⁵ shards, and an order key with
    * 10⁴ distinct values would tie-break almost every pair by raw id —
    * no longer a uniform permutation). Shared with [[Quality]]'s feature
    * hasher — one portable hash family across the sampling/scoring
    * surface, one SQL replica idiom (q76's list_reduce fold). */
  private[operators] def avalanche(idCol: Column, salt: String): Column = {
    val h = ColumnGlue.column(AsciiPolyHash(ColumnGlue.expression(
      concat(idCol.cast("string"), lit(salt)))))
    ((h + MixA) * (h + MixB)) % P
  }

  /** The raw polynomial fold of the key ALONE (no salt, no avalanche
    * mix) — the staging half of [[avalancheExtend]]. */
  private[operators] def polyFold(idCol: Column): Column =
    ColumnGlue.column(AsciiPolyHash(ColumnGlue.expression(idCol.cast("string"))))

  /** [[avalanche]] over `key || suffix`, computed by EXTENDING a staged
    * [[polyFold]] of the key with the (ASCII) suffix's characters — the
    * polynomial identity h(key‖s) = fold(s over h(key)), so the value is
    * bit-identical to `avalanche(idCol, suffix)` (spec-asserted) while a
    * caller hashing one key under MANY salts (the AMS sketch's
    * depth·reps cells) folds the key once instead of per salt.
    * ASCII suffixes only: the char-code fold equals the UTF-8 byte fold
    * exactly when every suffix char is < 0x80 (enforced). */
  private[operators] def avalancheExtend(stagedFold: Column, suffix: String): Column = {
    require(suffix.forall(_ < 0x80),
      s"avalancheExtend: non-ASCII suffix '$suffix' would diverge from the byte fold")
    val h = suffix.foldLeft(stagedFold)((acc, c) =>
      (acc * 31 + lit(c.toLong)) % P)
    ((h + MixA) * (h + MixB)) % P
  }

  /** JVM-side twin of [[avalanche]] — bit-identical for any string that
    * round-trips the Catalyst cast (the keyed-state streaming operators
    * hash inside `flatMapGroupsWithState`, where no Column exists;
    * StreamingHll's batch-equivalence contract rides this identity). */
  private[graft] def avalancheJvm(id: String, salt: String): Long = {
    val bts = (id + salt).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bts.length) { h = (h * 31 + (bts(i) & 0xff)) % P; i += 1 }
    ((h + MixA) * (h + MixB)) % P
  }

  /** Deterministic Bernoulli(fraction) sample keyed on `idCol`. */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    df.where(bucket(col(idCol), salt) < math.round(fraction * Buckets))
  }

  /** Per-stratum deterministic rates — domain mixing: each stratum value
    * (language, source, quality band…) keeps its own fraction; strata not
    * listed keep `defaultFraction`. The per-row threshold is a literal
    * CASE chain over the (small, driver-side) rate map — a projection, not
    * a join, so the scan stays a single narrow pass. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    (defaultFraction +: fractions.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0,1]"))
    // deterministic chain order — Map iteration order must not leak into
    // the plan (strata are disjoint, but plan stability matters for tests)
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * Buckets))) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.where(bucket(col(idCol), salt) < threshold)
  }

  /** Token-budget domain mixing — downsample each stratum (language,
    * source, quality band…) to a target WEIGHT budget rather than a row
    * fraction: the form corpus-mixing actually takes (pretraining mixes
    * are specified in tokens per domain, not document counts). Strata
    * with a budget keep rate `min(1, budget / total_weight)`; strata
    * without one pass through whole. Selection is the same hash-gated
    * deterministic Bernoulli as [[deterministicSample]], so the kept
    * token mass lands on the budget in expectation and the selected SET
    * is stable across runs, partitioning, and engines.
    *
    * Scale shape: one map-side-combining aggregation over (stratum,
    * weight) — output is |strata| rows — broadcast back, then a pure
    * narrow filter. No corpus-sized shuffle anywhere.
    *
    * Thresholds use `floor(frac · B)` explicitly: both engines compute
    * the identical IEEE quotient, and floor (unlike a double→int cast)
    * has one cross-engine rounding semantics.
    *
    * Rows with a NULL stratum are dropped (the totals join is an inner
    * equi-join and null keys never match) — a null domain label has no
    * budget semantics; coalesce upstream if such rows must survive.
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weight: Column,
      budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    require(budgets.nonEmpty, "at least one stratum budget required")
    budgets.foreach { case (k, b) =>
      require(b >= 0L, s"stratum '$k' budget $b must be >= 0") }
    val totals = df.groupBy(col(strataCol)).agg(sum(weight).as("total_w_"))
    // literal CASE chain in sorted key order (plan stability), null for
    // unbudgeted strata => keep-all
    val budgetD = budgets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, b)) =>
        when(col(strataCol) === lit(k), lit(b.toDouble)).otherwise(acc)
    }
    val frac = when(budgetD.isNull, lit(1.0))
      .otherwise(least(lit(1.0), budgetD / col("total_w_")))
    df.join(broadcast(totals), Seq(strataCol))
      .where(bucket(col(idCol), salt) < floor(frac * Buckets))
      .drop("total_w_")
  }

  /** Disjoint train/validation/test assignment: adds `outputCol` with the
    * split name chosen by the row's bucket against cumulative weight
    * boundaries. Weights must sum to 1 (±1 bucket of rounding slack); the
    * last split absorbs the rounding remainder so every row is assigned.
    * Same determinism contract as the samplers: the assignment is a pure
    * projection, stable under re-partitioning, retries, and engines. */
  def withSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      outputCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split names")
    splits.foreach { case (n, w) =>
      require(w > 0.0 && w <= 1.0, s"split '$n' weight $w outside (0,1]") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) * Buckets <= 1.0,
      s"split weights sum to $total, expected 1.0")
    val b = bucket(col(idCol), salt)
    val bounds = splits.init.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Buckets) }.tail
    val assigned = splits.init.zip(bounds).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), upper)) =>
      when(b < upper, lit(name)).otherwise(acc)
    }
    // A NULL id hashes to a NULL bucket, every `b < upper` is null, and
    // the fold's base would silently shovel all null-id rows into the
    // LAST split (usually the eval set — the worst place for undefined
    // rows). Assign NULL instead, consistent with the samplers' null-drop
    // semantics: a row with no identity has no deterministic fate, and
    // the caller must decide, visibly. (The DuckDB oracles need no
    // null branch — fixture ids are non-null by contract.)
    df.withColumn(outputCol, when(col(idCol).isNotNull, assigned))
  }

  /** Leakage-safe split: [[withSplit]] keyed by a GROUP label instead of
    * the row id, so every member of a near-dup cluster lands in the SAME
    * split. Splitting on the row id leaks: near-identical documents
    * straddle train and eval, and the eval score measures memorization
    * of the train-side twin, not generalization — the overlap failure
    * the decontamination family (L8/L17) scrubs AFTER assignment, here
    * prevented AT assignment. `groups` is any (idCol, groupCol) frame;
    * [[Dedup.dedupClusters]]' labels are the canonical source. Rows
    * absent from `groups` key on their own id (a singleton is its own
    * group), so the assignment stays total, and because
    * [[Dedup.dedupClusters]] labels a cluster by its MIN member id, a
    * singleton's label equals its id — present and absent singletons
    * draw identical buckets and pre-pruned group frames change nothing.
    *
    * Scale shape: ONE id-keyed join against the (id, label) frame
    * (16-byte currency); the split itself stays [[withSplit]]'s pure
    * narrow projection on the label. */
  def splitByGroup(
      df: DataFrame,
      groups: DataFrame,
      idCol: String = "doc_id",
      groupCol: String = "cluster_id",
      splits: Seq[(String, Double)] =
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)),
      salt: String = "",
      outputCol: String = "split"): DataFrame = {
    val g = groups.select(col(idCol).as("gid_"), col(groupCol).as("glabel_"))
    val joined = df.join(g, df(idCol) === col("gid_"), "left")
      .withColumn("split_key_", coalesce(col("glabel_"), df(idCol)))
    withSplit(joined, "split_key_", splits, salt, outputCol)
      .drop("gid_", "glabel_", "split_key_")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006), the
    * deterministic form: each row draws u ∈ (0,1) from its stable id
    * (the same engine-portable [[bucket]] machinery as every sampler
    * here, u = (bucket + 0.5)/B — never 0, so the log is finite) and is
    * ranked by key = ln(u)/w; the k largest keys per group are the
    * sample. Heavier rows win proportionally more often — the exact
    * inclusion semantics pretraining mixes want when upsampling curated
    * domains — yet the selected SET is a pure function of (ids, weights,
    * salt): stable across runs, partitioning, and engines.
    *
    * The key is ROUNDED to 9 decimals before ranking (ties then break on
    * the id): both engines compute ln and the divide in IEEE doubles,
    * and the round absorbs the last-ulp libm differences that could
    * otherwise flip a rank at the selection boundary — the same
    * "rank on rounded score" discipline as the ANN family.
    *
    * Ranking runs on the TopKPerKey heap operator: the map-side partial
    * trim keeps k rows per group per partition, so the exchange never
    * moves the corpus ([[graft.plans.TopK]]; with `groupCols` empty the
    * sample is global — a single constant key, fine for small k, use
    * groups when k·|groups| is the real budget). Rows with weight ≤ 0 or
    * NULL are dropped: they have no sampling mass.
    *
    * Output: the surviving rows plus `es_rank` (1-based within group). */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      groupCols: Seq[String] = Nil,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val w = col(weightCol).cast("double")
    val u = (bucket(col(idCol), salt).cast("double") + 0.5) / Buckets
    val base = df.filter(w.isNotNull && w > 0)
      .withColumn("es_key_", round(log(u) / w, 9))
    val keys = if (groupCols.isEmpty) Seq(lit(1)) else groupCols.map(col)
    graft.plans.TopK
      .perKey(base, keys, Seq(col("es_key_").desc, col(idCol)), k, "es_rank")
      .drop("es_key_")
  }

  /** Temperature-scaled domain mixing rates (the mC4/multilingual-LM
    * recipe): sampling probability per stratum ∝ mass^alpha, so alpha = 1
    * keeps natural proportions, alpha = 0 equalizes strata, and values
    * between up-weight the tail without drowning the head. Input is the
    * per-stratum mass map (token counts from one aggregation — driver
    * state the size of the domain list); output is a per-stratum KEEP
    * RATE for [[stratifiedSample]] such that expected kept mass ≈
    * `budget` overall: rate_d = min(1, p_d·budget / mass_d). Rates that
    * cap at 1 leave the residual budget unclaimed deliberately —
    * redistribution would over-sample heads, the standard fixed-point
    * refinement callers can iterate if they need the budget exact. */
  def temperatureRates(
      massByStratum: Map[String, Long],
      alpha: Double,
      budget: Long): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0,1]")
    require(budget >= 0L, s"budget $budget must be >= 0")
    require(massByStratum.values.forall(_ > 0L), "strata must have positive mass")
    if (massByStratum.isEmpty) Map.empty
    else {
      val pw = massByStratum.view.mapValues(m => math.pow(m.toDouble, alpha)).toMap
      val z = pw.values.sum
      massByStratum.map { case (d, m) =>
        d -> math.min(1.0, pw(d) / z * budget / m.toDouble)
      }
    }
  }

  /** Relational mixture/epoch PLAN — the artifact a training run is
    * configured from (the relational form of [[temperatureRates]], which
    * is driver-side model arithmetic): per stratum, available token
    * mass, temperature-scaled target share (∝ mass^α — α=1 natural,
    * α=0 equalized), target tokens under `budget`, planned tokens capped
    * at `maxEpochs`·mass (the data-constrained-scaling regime: repeating
    * a small high-quality source beats overweighting a big one, but only
    * up to a few epochs — the L34 rationale at mixture level), the
    * implied epoch count, and the shortfall the cap leaves unfilled
    * (surfaced, not silently redistributed — reallocation is a POLICY
    * decision the caller makes by re-running with adjusted α/budget).
    *
    * Scale shape: ONE corpus-touching aggregation (mass per stratum,
    * map-side combined); everything after is arithmetic on the
    * strata-sized frame. pow(mass, α) is transcendental — contributions
    * round into DECIMAL(28,14) before the share normalization (the
    * drift-family accumulation rule), so the plan replays in SQL. */
  def mixturePlan(
      df: DataFrame,
      strataCol: String,
      weight: Column,
      alpha: Double,
      budget: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0,1]")
    require(budget >= 0L, s"budget $budget must be >= 0")
    require(maxEpochs > 0.0, s"maxEpochs $maxEpochs must be > 0")
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val mass = df.groupBy(col(strataCol).as("stratum"))
      .agg(sum(weight).cast(LongType).as("tokens_available"))
    val pw = mass.select(col("stratum"), col("tokens_available"),
      pow(col("tokens_available").cast(DoubleType), lit(alpha))
        .cast(DecimalType(28, 14)).as("pw"))
    val z = pw.agg(sum("pw").as("z_"))
    pw.crossJoin(broadcast(z))
      .select(col("stratum").as(strataCol), col("tokens_available"),
        round((col("pw") / col("z_")).cast(DoubleType), 6).as("share"),
        round((col("pw") / col("z_")).cast(DoubleType) * budget)
          .cast(LongType).as("target_tokens"))
      .withColumn("planned_tokens",
        least(col("target_tokens"),
          round(col("tokens_available") * maxEpochs).cast(LongType)))
      .withColumn("epochs",
        round(col("planned_tokens").cast(DoubleType) / col("tokens_available"), 4))
      .withColumn("shortfall", col("target_tokens") - col("planned_tokens"))
  }

  /** Materialize a [[mixturePlan]]: emit each document `epochs` times —
    * the integer part as whole copies, the fractional epoch as a
    * hash-gated extra copy (the same engine-portable [[bucket]] decision
    * as every sampler here: epochs = 2.3 means every doc appears twice
    * and a deterministic 30% of docs appear a third time). The output
    * feeds the packer/shard export directly; `epoch` (1-based copy
    * index) lets a loader interleave epochs rather than concatenate
    * them. Strata absent from the plan emit nothing — the plan IS the
    * admission list.
    *
    * Scale shape: one broadcast join against the strata-sized plan, then
    * a narrow per-row explode of at most ⌈epochs⌉ copies — no shuffle;
    * the corpus is read once and amplified in place. */
  def materializeEpochs(
      df: DataFrame,
      plan: DataFrame,
      strataCol: String = "source",
      idCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    val p = plan.select(col(strataCol), col("epochs"))
    val full = floor(col("epochs")).cast("long")
    val extra = (bucket(col(idCol), salt) <
      round((col("epochs") - floor(col("epochs"))) * Buckets)).cast("long")
    df.join(broadcast(p), Seq(strataCol))
      .withColumn("copies_", full + extra)
      .withColumn("epoch",
        explode_outer(when(col("copies_") >= 1L,
          sequence(lit(1L), col("copies_")))
          .otherwise(array().cast("array<bigint>"))))
      .where(col("epoch").isNotNull)
      .drop("copies_", "epochs")
  }

  /** Deterministic global shuffle + shard assignment — the EXPORT step of
    * a training pipeline. Data loaders want the corpus pre-shuffled and
    * cut into shard files whose contents and ORDER are reproducible
    * run-over-run (resumable training, bit-identical re-exports). A
    * global `ORDER BY random()` is wrong twice at 100 TB: the RNG ties
    * the order to partitioning/retries, and a total sort is an all-data
    * range exchange. This is the scalable shape instead:
    *
    *  - `shard` = avalanched id hash mod `nShards` — a narrow projection;
    *  - `pos`   = rank of a SECOND, decorrelated id hash within the
    *    shard — one hash-partitioned exchange on `shard`, then each shard
    *    sorts locally (the classic shuffle-by-shard / sort-within-shard
    *    export).
    *
    * Each shard is ordered by an id-derived hash, so concatenating the
    * shards is a uniform permutation of the corpus; the whole layout is a
    * pure function of (ids, nShards, salt). One task sorts one shard —
    * size `nShards` so a shard fits a task comfortably (≈ ≤1 GiB of
    * payload; at 100 TB that is nShards ≈ 100k, far above any practical
    * parallelism floor). Salt rerolls the permutation per epoch.
    *
    * Output: input columns + `shard` (long in [0, nShards)) + `pos`
    * (1-based long within shard, in shard order).
    *
    * `groupCols` shards WITHIN each group independently (the per-SPLIT
    * export: train shards never interleave val/test rows) — positions
    * restart per (group, shard), one exchange either way. */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "",
      groupCols: Seq[String] = Nil): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    Seq("shard", "pos", "ord_").foreach(c =>
      require(!df.columns.contains(c),
        s"column '$c' already exists — rename it before shuffleShards"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col) :+ col("shard"): _*)
      .orderBy(col("ord_"), col(idCol))
    // both keys from the UN-quantized avalanche: shard counts beyond 10⁴
    // and an order key that almost never ties (see [[avalanche]])
    df.withColumn("shard", avalanche(col(idCol), salt + "#s") % nShards)
      .withColumn("ord_", avalanche(col(idCol), salt + "#o"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("ord_")
  }

  /** Quality-ordered token-budget selection — the deterministic
    * best-first counterpart of [[tokenBudgetSample]] (which admits a
    * hash-random subset at the budgeted RATE): per slice, rank docs by
    * (quality DESC, id) and keep each doc whose cumulative token mass
    * BEFORE it is still under `tokenBudget` — so the budget buys the
    * best tokens, not a random sample, and the last admitted doc may
    * overshoot by part of itself (the standard prefix-admission rule;
    * a truncating variant is a filter on `cum_before + nt ≤ budget`).
    *
    * Output: the input projection + `nt`, `quality`, `cum_before`,
    * `kept` — every doc scored and positioned, callers filter on
    * `kept` (the decision record is the point, like q60's manifest).
    *
    * Scale shape: scoring is a narrow map; the per-slice exclusive
    * prefix sum is [[Packing.withGroupedOffset]]'s two-pass range
    * exchange — NEVER a `Window.partitionBy(slice)` (one 5 TB task per
    * source at corpus scale). */
  def budgetByQuality(
      df: DataFrame,
      tokenBudget: Long,
      sliceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(tokenBudget >= 0L, s"tokenBudget $tokenBudget must be >= 0")
    val staged = df.select(col(idCol), col(sliceCol),
      graft.functions.TextOps.tokenCount(col(textCol)).as("nt"),
      graft.functions.TextOps.qualityScore(col(textCol)).as("quality"))
    Packing.withGroupedOffset(staged, Seq(sliceCol),
        Seq(col("quality").desc, col(idCol)), "nt", "cum_before")
      .withColumn("kept", col("cum_before") < tokenBudget)
  }

  /** Deterministic negative sampling for contrastive / retrieval
    * training pairs: for each anchor row, up to `k` pseudo-uniform
    * negatives drawn from the corpus, excluding candidates that share
    * `groupCol` with the anchor (the trivial-positive guard — same dedup
    * cluster, same source, same query id; pass a constant column for no
    * exclusion). Everything is a pure function of (ids, salt): repeated
    * runs, retries, and both sides of a resumed export draw identical
    * pairs (the [[shuffleShards]] reproducibility contract).
    *
    * The draw: corpus rows land in `nBuckets` hash buckets; draw j of an
    * anchor routes to bucket avalanche(id·j, salt#t) and takes the
    * member minimizing a pair-decorrelated hash — i.e. a two-level
    * hash-pick that never materializes the corpus×corpus square.
    * Negatives are DISTINCT per anchor: two draws that route to the same
    * bucket can pick the same member, and a duplicated (anchor, negative)
    * pair is wasted or harmful in a contrastive batch, so the collided
    * later draw is dropped (keeping the smallest draw index). An
    * anchor's draw j thus yields nothing if its routed bucket is empty
    * of other-group members OR it collided with an earlier draw — both
    * surface as missing rows (output has ≤ k rows per anchor), never a
    * silent resample; geometry is the caller's knob: keep bucket
    * occupancy ≥ ~8 by scaling nBuckets ≈ N/8, and same-group
    * concentration low by salting well.
    *
    * Output: (anchor id, `draw` in [1,k], `neg_<idCol>` — the sampled
    * negative's id). Join payloads back by id afterwards; pairs travel
    * as ids only.
    *
    * Scale shape: anchors fan out ×k (narrow), ONE bucket-keyed
    * shuffle-hash join against the bucketed corpus (both sides
    * corpus-sized — never broadcast), one (anchor, draw)-keyed min
    * aggregation with map-side combining. Join fan-out is k·N/nBuckets
    * per anchor — CONSTANT when nBuckets scales with N, the documented
    * contract. No driver state, no global sort. */
  /** The count-conditional bucket rule for [[negativePairs]]:
    * `max(minBuckets, n / targetOccupancy)` — the documented
    * "nBuckets ≈ N/8" contract made executable, so per-draw join
    * fan-out (k·N/nBuckets ≈ k·targetOccupancy) stays CONSTANT as the
    * corpus grows instead of linear (the r14 verdict's q143 finding:
    * a pinned 64 measured 29.4× at 10× data). A pure integer function
    * of the corpus count, so a SQL oracle replays it verbatim as
    * `GREATEST(minBuckets, COUNT(*) // targetOccupancy)`. */
  def scaledBuckets(n: Long, minBuckets: Int = 64, targetOccupancy: Int = 8): Int = {
    require(n >= 0L && minBuckets >= 1 && targetOccupancy >= 1,
      s"scaledBuckets(n=$n, minBuckets=$minBuckets, targetOccupancy=$targetOccupancy)")
    math.min(Int.MaxValue.toLong, math.max(minBuckets.toLong, n / targetOccupancy)).toInt
  }

  /** [[negativePairs]] with `nBuckets` derived by [[scaledBuckets]] from
    * a cheap corpus count (parquet row-count metadata — no full scan):
    * the production entry point; the fixed-`nBuckets` overload remains
    * for callers pinning geometry across snapshots of known size. */
  def negativePairsAuto(
      df: DataFrame,
      idCol: String,
      k: Int,
      groupCol: String,
      salt: String = "",
      minBuckets: Int = 64,
      targetOccupancy: Int = 8): DataFrame =
    negativePairs(df, idCol, k,
      scaledBuckets(df.count(), minBuckets, targetOccupancy), groupCol, salt)

  def negativePairs(
      df: DataFrame,
      idCol: String,
      k: Int,
      nBuckets: Int,
      groupCol: String,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val members = df.select(
      col(idCol).as("nid_"), col(groupCol).as("ngrp_"),
      (avalanche(col(idCol), s"$salt#b") % nBuckets).as("bkt_"))
    val draws = df.select(col(idCol).as("aid_"), col(groupCol).as("agrp_"))
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .withColumn("bkt_",
        avalanche(concat(col("aid_").cast("string"), lit(":"), col("draw")),
          s"$salt#t") % nBuckets)
    draws.join(members, Seq("bkt_"))
      .where(col("nid_") =!= col("aid_") && !(col("ngrp_") <=> col("agrp_")))
      .withColumn("pick_",
        avalanche(concat(col("aid_").cast("string"), lit(":"), col("draw"),
          lit(":"), col("nid_").cast("string")), s"$salt#p"))
      .groupBy(col("aid_"), col("draw"))
      .agg(min_by(col("nid_"), struct(col("pick_"), col("nid_"))).as(s"neg_$idCol"))
      // distinct-negatives contract: same-bucket draw collisions keep
      // only the smallest draw index (one more narrow agg on the
      // already-(anchor)-clustered frame — no extra exchange width)
      .groupBy(col("aid_"), col(s"neg_$idCol"))
      .agg(min(col("draw")).as("draw"))
      .select(col("aid_").as(idCol), col("draw"), col(s"neg_$idCol"))
  }

  /** Neyman-optimal stratified allocation (Neyman 1934 — the survey-
    * sampling answer to "how many rows should each stratum contribute to
    * a fixed label/eval budget"): allocate n_h ∝ N_h·S_h (stratum size ×
    * stratum std-dev of the measured value), which minimizes the
    * variance of the estimated population mean at fixed total n —
    * high-variance strata earn MORE than proportional share, uniform
    * strata less. The budgeting layer under eval-set construction and
    * annotation spend: [[stratifiedSample]]/[[budgetByQuality]] execute
    * a plan; this computes the optimal plan.
    *
    * Determinism contract (the [[graft.operators.Trend]] discipline):
    * values quantize to integer units (`round(v·10^d)` as long), the
    * three sufficient statistics (n, Σq, Σq²) accumulate in exact
    * DECIMAL(19,0)/(38,0); S_h is then a FIXED-ORDER double expression
    * over those exact sums (`sqrt` is IEEE-correctly-rounded — cross-
    * engine safe, unlike ln/exp), the Neyman weight N_h·S_h rounds to 6
    * decimals and re-enters exact decimal for the normalization sum, so
    * shares and integer allocations replay bit-identically in SQL.
    *
    * Allocation: `n_alloc = min(N_h, floor(budget · w_h / Σw))` —
    * flooring the unrounded share of the rounded weights; the remainder
    * `budget − Σ n_alloc` is surfaced per-stratum as `alloc_share` so a
    * caller distributing leftovers (largest-remainder or policy) can.
    * Single-row strata carry S = 0 (no within-stratum variance
    * evidence), earning weight 0 — surfaced, not dropped.
    *
    * Scale shape: ONE corpus-touching aggregation (map-side combined);
    * everything downstream is arithmetic on the strata-sized frame plus
    * one 1-row broadcast (the [[mixturePlan]] shape). */
  def neymanAllocation(
      df: DataFrame,
      strataCol: String,
      valueCol: Column,
      budget: Long,
      quantDecimals: Int = 2): DataFrame = {
    require(budget >= 0L, s"neymanAllocation: budget $budget < 0")
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(19, 0)
    val ys = math.pow(10.0, quantDecimals)
    val base = df.where(col(strataCol).isNotNull && valueCol.isNotNull)
      .select(col(strataCol).as("stratum"),
        round(valueCol * ys).cast("long").cast(D).as("__q"))
    val per = base.groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__q")).as("s1"),
        sum(col("__q") * col("__q")).as("s2"))
    val n = col("n_rows").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    // sample variance in quantized units², guarded against FP-negative
    val varQ = (n * s2 - s1 * s1) / (n * (n - lit(1.0)))
    val sQ = when(col("n_rows") > 1 && varQ > 0.0, sqrt(varQ)).otherwise(lit(0.0))
    val weighted = per.select(col("stratum"), col("n_rows"),
      round(n * sQ, 6).as("__w"),
      round(sQ / ys, 6).as("stddev"))
    val tot = weighted.agg(
      sum(col("__w").cast(DecimalType(28, 14))).as("__tot"))
    weighted.crossJoin(broadcast(tot)).select(
      col("stratum").as(strataCol),
      col("n_rows"), col("stddev"),
      when(col("__tot") > 0,
        round(col("__w") / col("__tot").cast("double"), 6))
        .otherwise(lit(0.0)).as("alloc_share"),
      when(col("__tot") > 0,
        least(col("n_rows"),
          floor(lit(budget.toDouble) *
            (col("__w") / col("__tot").cast("double"))).cast("long")))
        .otherwise(lit(0L)).as("n_alloc"))
  }

  /** Source-fair interleave ordering — the export ORDER that prevents
    * source-burst training (all of source A, then all of B): rank rows
    * within each stratum by a deterministic hash-shuffled key, then
    * order globally by (within-stratum rank, stratum). Reading the
    * output sequentially visits one row per stratum per "round" while
    * every stratum lasts, then continues round-robin over the
    * survivors — the interleave a curriculum reader wants without any
    * global shuffle of the corpus (the only exchanges are the stratum
    * rank window and whatever total order the SINK asks for; at 100 TB
    * the (round, stratum) pair IS the sort key the writer range-
    * partitions on).
    *
    * Determinism: the within-stratum order is [[avalanche]]-keyed
    * (hash-shuffled, salt-steerable, id tie-broken) — no RNG state.
    * Output: input columns + `round` (1-based within-stratum rank) —
    * the caller sorts by (round, stratumCol) at write time.
    */
  def fairInterleave(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      salt: String = ""): DataFrame = {
    require(!df.columns.contains("round"),
      "column 'round' already exists — rename it before fairInterleave")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(avalanche(col(idCol), salt + "#f"), col(idCol))
    df.withColumn("round", row_number().over(w).cast("long"))
  }

  /** Cumulative-CDF thresholds for a Poisson(1) draw by inversion on the
    * [[avalanche]] uniform over [0, P): weight w(u) = #{k : u ≥ T_k},
    * T_k = round(P · CDF_Poisson(1)(k)), truncated at w ≤ 8
    * (P(W ≥ 9) ≈ 1.1e-6 — a negligible, and in any case DETERMINISTIC,
    * truncation both engines share). Fixed-order double fold; the values
    * are interpolated into oracles as integer literals. */
  private[graft] val PoissonOneThresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    var term = e1
    var cum = 0.0
    (0 to 7).map { k =>
      if (k > 0) term = term / k
      cum += term
      math.round(cum * P)
    }
  }

  /** [[poissonBootstrapMean]] GROUPED by a segment column — "which
    * source's mean moved beyond its own resampling noise" (the
    * [[graft.operators.Quality.ksTestBy]] argument applied to the
    * bootstrap: a corpus-wide CI hides the segment whose mean jumped).
    * Same weights, same exactness contract, but every frame keys on the
    * segment: the replicate aggregation is (segment × B)-keyed, the
    * rank window partitions BY SEGMENT (real parallelism), and the
    * final assembly is segment-keyed equi-joins — no broadcast
    * crossJoin anywhere. Output: one row per segment with ≥1 surviving
    * replicate. */
  def poissonBootstrapMeanBy(
      df: DataFrame,
      segmentCol: String,
      idCol: String,
      valueCol: String,
      replicates: Int = 64,
      salt: String = "boot",
      alphaPct: Int = 5): DataFrame = {
    require(replicates >= 8 && replicates <= 512,
      s"replicates $replicates outside [8, 512]")
    require(alphaPct >= 1 && alphaPct <= 20, s"alphaPct $alphaPct outside [1, 20]")
    require(salt.forall(_ < 0x80), s"non-ASCII salt '$salt' breaks the byte fold")
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"poissonBootstrapMeanBy: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize (round(x*1e6) micro-score convention)")
    }
    val staged = df
      .where(col(segmentCol).isNotNull)
      .select(col(segmentCol).as("segment"), col(idCol).cast("string").as("k"),
        col(valueCol).cast(LongType).as("x"))
      .where(col("k").isNotNull && col("x").isNotNull)
      .select(col("segment"), polyFold(concat(col("k"), lit(salt))).as("hf"),
        col("x"))
    val base = staged.groupBy("segment").agg(count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(38, 0))).as("sx"))
    val f1 = (col("hf") * 31 + (expr("b DIV 100") + lit(48L))) % P
    val f2 = (f1 * 31 + (expr("(b DIV 10) % 10") + lit(48L))) % P
    val f3 = (f2 * 31 + (expr("b % 10") + lit(48L))) % P
    val u = ((f3 + MixA) * (f3 + MixB)) % P
    val w = PoissonOneThresholds
      .map(tk => when(u >= tk, 1L).otherwise(0L)).reduce(_ + _)
    val reps = staged
      .select(col("segment"), col("hf"), col("x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .select(col("segment"), col("b"), col("x"), w.as("w"))
      .groupBy("segment", "b")
      .agg(sum((col("w") * col("x")).cast(DecimalType(38, 0))).as("swx"),
        sum(col("w")).as("sw"))
      .where(col("sw") > 0L)
      .select(col("segment"), col("b"),
        round(col("swx").cast(DoubleType) / col("sw"), 6).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cnt = reps.groupBy("segment").agg(count(lit(1)).as("b_used"),
      sum(col("m").cast(DecimalType(38, 6))).cast(DoubleType).as("s1"),
      sum((col("m") * col("m")).cast(DecimalType(38, 12))).cast(DoubleType).as("s2"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("segment").orderBy(col("m"), col("b"))
    val ranked = reps.withColumn("r", row_number().over(ord).cast(LongType))
      .join(cnt, "segment")
    val lo = ranked.where(col("r") === expr(s"(b_used * $alphaPct + 199) DIV 200"))
      .select(col("segment"), col("m").as("boot_lo"))
    val hi = ranked
      .where(col("r") === expr(s"b_used + 1 - (b_used * $alphaPct + 199) DIV 200"))
      .select(col("segment"), col("m").as("boot_hi"))
    base.join(cnt, "segment").join(lo, "segment").join(hi, "segment")
      .select(col("segment").as(segmentCol), col("n"), col("b_used"),
        round(col("sx").cast(DoubleType) / col("n"), 6).as("mean"),
        col("boot_lo"), col("boot_hi"),
        when(col("b_used") > 1L, round(sqrt(greatest(
          (col("s2") - (col("s1") * col("s1")) / col("b_used")) /
            (col("b_used") - lit(1L)), lit(0.0))), 6)).as("se_boot"))
  }

  /** Poisson bootstrap confidence interval for a corpus mean (Chamandy,
    * Muralidharan, Najmi & Naidu 2012, "Estimating uncertainty for
    * massive data streams" — the distributed bootstrap: resampling
    * n-out-of-n needs a global n BEFORE drawing, which no streaming/
    * sharded pass has; giving every row an independent Poisson(1)
    * weight per replicate is asymptotically the same multinomial and
    * needs NO coordination, merges across partitions, shards and time).
    * The inference companion the eval tier reads: a mean moved — is the
    * move bigger than resampling noise?
    *
    * Determinism (no RNG state anywhere): replicate b's weight for row
    * id is Poisson-inverted from the [[avalanche]] uniform of
    * id‖salt‖zeroPad3(b) — the digit fold extends a staged [[polyFold]]
    * of id‖salt (the AMS refold idiom), so the corpus hashes the key
    * ONCE and each replicate costs three integer fold steps + the mix.
    * Weights are pure integer comparisons against
    * [[PoissonOneThresholds]] — exact in any int64 engine.
    *
    * Exactness: valueCol must be integral (fail-loud, the micro-score
    * convention); per-replicate sums accumulate as exact DECIMAL(38,0);
    * each replicate mean is ONE double division of exact operands
    * rounded 6; the CI picks are exact order statistics over the
    * (m, b)-ordered replicate frame at ranks ceil(B'·α/200) /
    * B'+1−ceil(B'·α/200) (count-conditional integer rule, oracle-
    * replayable); se_boot derives from exact decimal Σm/Σm² through a
    * fixed-order double chain with one IEEE sqrt.
    *
    * Scale shape: the corpus is touched once as a narrow (hash, x)
    * projection; the ×B replicate fan-out collapses map-side into B
    * partial sums per partition (the AMS sketch's fan-out shape — the
    * shuffle carries B·partitions rows at ANY corpus size); everything
    * after the replicate frame is ≤B rows. Replicate means of empty
    * replicates (all-zero weights — e^{-n}, impossible beyond toy n)
    * drop, and the rank rule re-derives from the surviving count.
    * Output: ONE row (n, b_used, mean, boot_lo, boot_hi, se_boot);
    * empty input yields zero rows. */
  def poissonBootstrapMean(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      replicates: Int = 64,
      salt: String = "boot",
      alphaPct: Int = 5): DataFrame = {
    require(replicates >= 8 && replicates <= 512,
      s"replicates $replicates outside [8, 512]")
    require(alphaPct >= 1 && alphaPct <= 20, s"alphaPct $alphaPct outside [1, 20]")
    require(salt.forall(_ < 0x80), s"non-ASCII salt '$salt' breaks the byte fold")
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"poissonBootstrapMean: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize (round(x*1e6) micro-score convention)")
    }
    val staged = df
      .select(col(idCol).cast("string").as("k"), col(valueCol).cast(LongType).as("x"))
      .where(col("k").isNotNull && col("x").isNotNull)
      .select(polyFold(concat(col("k"), lit(salt))).as("hf"), col("x"))
    val base = staged.agg(count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(38, 0))).as("sx"))
    // replicate id folds in as three zero-padded ASCII digits — the value
    // is bit-identical to avalanche(id, salt + "%03d".format(b))
    val f1 = (col("hf") * 31 + (expr("b DIV 100") + lit(48L))) % P
    val f2 = (f1 * 31 + (expr("(b DIV 10) % 10") + lit(48L))) % P
    val f3 = (f2 * 31 + (expr("b % 10") + lit(48L))) % P
    val u = ((f3 + MixA) * (f3 + MixB)) % P
    val w = PoissonOneThresholds
      .map(tk => when(u >= tk, 1L).otherwise(0L)).reduce(_ + _)
    val reps = staged
      .select(col("hf"), col("x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .select(col("b"), col("x"), w.as("w"))
      .groupBy("b")
      .agg(sum((col("w") * col("x")).cast(DecimalType(38, 0))).as("swx"),
        sum(col("w")).as("sw"))
      .where(col("sw") > 0L)
      .select(col("b"), round(col("swx").cast(DoubleType) / col("sw"), 6).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cnt = reps.agg(count(lit(1)).as("b_used"),
      sum(col("m").cast(DecimalType(38, 6))).cast(DoubleType).as("s1"),
      sum((col("m") * col("m")).cast(DecimalType(38, 12))).cast(DoubleType).as("s2"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(pmod(col("b"), lit(1))).orderBy(col("m"), col("b"))
    val ranked = reps.withColumn("r", row_number().over(ord).cast(LongType))
      .crossJoin(broadcast(cnt))
    val lo = ranked.where(col("r") === expr(s"(b_used * $alphaPct + 199) DIV 200"))
      .select(col("m").as("boot_lo"))
    val hi = ranked
      .where(col("r") === expr(s"b_used + 1 - (b_used * $alphaPct + 199) DIV 200"))
      .select(col("m").as("boot_hi"))
    // one-row output: eagerly materialize lineage-free so the replicate
    // cache releases before return (the dedupFromAssigned discipline)
    val out = base.crossJoin(broadcast(cnt))
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n"), col("b_used"),
        round(col("sx").cast(DoubleType) / col("n"), 6).as("mean"),
        col("boot_lo"), col("boot_hi"),
        // NULL (not a 0/0 NaN) at b_used = 1 — no spread to estimate,
        // the streaming twin's contract
        when(col("b_used") > 1L, round(sqrt(greatest(
          (col("s2") - (col("s1") * col("s1")) / col("b_used")) /
            (col("b_used") - lit(1L)), lit(0.0))), 6)).as("se_boot"))
      .localCheckpoint(true)
    reps.unpersist()
    out
  }

  /** Poisson bootstrap confidence interval for a two-arm mean
    * DIFFERENCE (the Chamandy et al. 2012 distributed bootstrap of
    * [[poissonBootstrapMean]], applied to the uplift) — the ESTIMATE
    * companion of [[permutationMeanDiff]]'s test: the randomization
    * test says whether the uplift is real, THIS says how big it is
    * with resampling-honest error bars, assumption-free where the
    * Welch interval leans on normality. Each replicate re-weights
    * every unit with an independent Poisson(1) draw (both arms, same
    * replicate stream — the paired-resample convention) and reads
    * Δ_b = weighted mean_T − weighted mean_C; the CI is exact order
    * statistics of the Δ_b's.
    *
    * Determinism/exactness: [[poissonBootstrapMean]]'s machinery
    * VERBATIM — avalanche weights from id‖salt‖zeroPad3(b) (zero RNG
    * state, corpus hashed once), per-(b, arm) weighted sums exact
    * Decimal(38,0), each Δ_b ONE fixed-order double chain rounded 6,
    * CI picks at the count-conditional ceil ranks, se from exact
    * decimal moments. Replicates where either arm draws zero total
    * weight drop (e^{-n} — toy n only) and the rank rule re-derives.
    *
    * Scale shape: the bootstrap's — one narrow corpus pass, ×B
    * map-side-collapsing fan-out (2B partial sums per partition),
    * everything after ≤B rows. Output ONE row: (n_treat, n_ctrl,
    * delta, boot_lo, boot_hi, b_used, se_boot, excludes_zero — the
    * decision read: the 1−α interval clear of 0). An empty observed
    * arm yields ZERO rows (every replicate drops with it — there is no
    * uplift to estimate; the [[poissonBootstrapMean]] empty-input
    * convention). */
  def poissonBootstrapDelta(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      treatCol: String,
      replicates: Int = 64,
      salt: String = "bootd",
      alphaPct: Int = 5): DataFrame = {
    require(replicates >= 8 && replicates <= 512,
      s"replicates $replicates outside [8, 512]")
    require(alphaPct >= 1 && alphaPct <= 20, s"alphaPct $alphaPct outside [1, 20]")
    require(salt.forall(_ < 0x80), s"non-ASCII salt '$salt' breaks the byte fold")
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"poissonBootstrapDelta: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize (round(x*1e6) micro-score convention)")
    }
    val DEC0 = DecimalType(38, 0)
    val staged = df
      .select(col(idCol).cast("string").as("k"),
        col(valueCol).cast(LongType).as("x"), col(treatCol).as("g"))
      .where(col("k").isNotNull && col("x").isNotNull && col("g").isNotNull)
      .select(polyFold(concat(col("k"), lit(salt))).as("hf"),
        col("x"), col("g"))
    val base = staged.agg(
      coalesce(sum(when(col("g"), 1L).otherwise(0L)), lit(0L)).as("n_t"),
      coalesce(sum(when(!col("g"), 1L).otherwise(0L)), lit(0L)).as("n_c"),
      coalesce(sum(when(col("g"), col("x")).otherwise(0L)).cast(DEC0),
        lit(0).cast(DEC0)).as("sx_t"),
      coalesce(sum(when(!col("g"), col("x")).otherwise(0L)).cast(DEC0),
        lit(0).cast(DEC0)).as("sx_c"))
    val f1 = (col("hf") * 31 + (expr("b DIV 100") + lit(48L))) % P
    val f2 = (f1 * 31 + (expr("(b DIV 10) % 10") + lit(48L))) % P
    val f3 = (f2 * 31 + (expr("b % 10") + lit(48L))) % P
    val u = ((f3 + MixA) * (f3 + MixB)) % P
    val w = PoissonOneThresholds
      .map(tk => when(u >= tk, 1L).otherwise(0L)).reduce(_ + _)
    val reps = staged
      .select(col("hf"), col("x"), col("g"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .select(col("b"), col("x"), col("g"), w.as("w"))
      .groupBy("b")
      .agg(
        coalesce(sum(when(col("g"), (col("w") * col("x")).cast(DEC0))),
          lit(0).cast(DEC0)).as("swx_t"),
        coalesce(sum(when(col("g"), col("w")).otherwise(0L)), lit(0L))
          .as("sw_t"),
        coalesce(sum(when(!col("g"), (col("w") * col("x")).cast(DEC0))),
          lit(0).cast(DEC0)).as("swx_c"),
        coalesce(sum(when(!col("g"), col("w")).otherwise(0L)), lit(0L))
          .as("sw_c"))
      .where(col("sw_t") > 0L && col("sw_c") > 0L)
      .select(col("b"), round(
        col("swx_t").cast(DoubleType) / col("sw_t") -
          col("swx_c").cast(DoubleType) / col("sw_c"), 6).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cnt = reps.agg(count(lit(1)).as("b_used"),
      sum(col("m").cast(DecimalType(38, 6))).cast(DoubleType).as("s1"),
      sum((col("m") * col("m")).cast(DecimalType(38, 12))).cast(DoubleType)
        .as("s2"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(pmod(col("b"), lit(1)))
      .orderBy(col("m"), col("b"))
    val ranked = reps.withColumn("r", row_number().over(ord).cast(LongType))
      .crossJoin(broadcast(cnt))
    val lo = ranked.where(col("r") === expr(s"(b_used * $alphaPct + 199) DIV 200"))
      .select(col("m").as("boot_lo"))
    val hi = ranked
      .where(col("r") === expr(s"b_used + 1 - (b_used * $alphaPct + 199) DIV 200"))
      .select(col("m").as("boot_hi"))
    val tested = col("n_t") > 0L && col("n_c") > 0L
    // one-row output: eagerly materialize lineage-free so the replicate
    // cache releases before return (the dedupFromAssigned discipline)
    val out = base.crossJoin(broadcast(cnt))
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(
        col("n_t").as("n_treat"), col("n_c").as("n_ctrl"),
        when(tested, round(
          col("sx_t").cast(DoubleType) / col("n_t") -
            col("sx_c").cast(DoubleType) / col("n_c"), 6)).as("delta"),
        when(tested, col("boot_lo")).as("boot_lo"),
        when(tested, col("boot_hi")).as("boot_hi"),
        when(tested, col("b_used")).as("b_used"),
        when(tested && col("b_used") > 1L, round(sqrt(greatest(
          (col("s2") - (col("s1") * col("s1")) / col("b_used")) /
            (col("b_used") - lit(1L)), lit(0.0))), 6)).as("se_boot"),
        when(tested,
          col("boot_lo") > lit(0.0) || col("boot_hi") < lit(0.0))
          .as("excludes_zero"))
      .localCheckpoint(true)
    reps.unpersist()
    out
  }

  /** Temperature-scaled source mixing weights (the multinomial
    * α-sampling recipe published with GPT-2/3-era corpora, the Pile's
    * per-set epochs, and LLaMA's sampling proportions; Devlin et al.
    * 2019 used α ≈ 0.7 for multilingual BERT) — THE data-mixing step of
    * a pretraining pipeline: raw proportions over-train the biggest
    * crawl and starve the small high-quality sets, so sources are drawn
    * ∝ n_s^α with temperature α ∈ (0, 1], and each source's EFFECTIVE
    * EPOCH count at a token budget T is w_s·T/n_s — the number a data
    * curator actually reviews (the Pile publishes exactly this table).
    *
    * Exactness: counts exact longs off ONE pass; α is the exact
    * rational alphaNum/alphaDen; n^α = exp(α·ln n) — one fixed-order
    * chain with one ln and one exp per source (the libm discipline);
    * the normalizer accumulates the per-source terms as Decimal(38,12)
    * (order-insensitive); weights/epochs are single divisions of those
    * deterministic doubles. `budgetTokens` defaults to N (the corpus
    * size itself) so eff_epochs reads "epochs under a one-corpus-sized
    * budget"; pass the real token budget for the production table.
    *
    * Guards: α must be in (0, 1] (fail-loud — α > 1 INVERTS the
    * rebalancing and is never what a mixing table means); empty input
    * yields zero rows. `upsampled` flags eff_epochs > 1 — the sources
    * a dedup-sensitive pipeline must watch (repeated epochs over a
    * small source amplify its near-dups; the Pile's published concern).
    *
    * Scale shape: ONE corpus aggregation to the per-source cells frame;
    * everything after is model-frame arithmetic with a broadcast 1-row
    * normalizer (the q61 class). Output one row per source:
    * (source, n, share_raw, weight, eff_epochs, upsampled). */
  def temperatureMixWeights(
      df: DataFrame,
      sourceCol: String,
      alphaNum: Int = 1,
      alphaDen: Int = 2,
      budgetTokens: Option[Long] = None,
      roundTo: Int = 6): DataFrame = {
    require(alphaNum >= 1 && alphaDen >= 1 && alphaNum <= alphaDen,
      s"temperatureMixWeights: alpha $alphaNum/$alphaDen outside (0, 1]")
    require(budgetTokens.forall(_ > 0L),
      s"budgetTokens $budgetTokens must be positive when set")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val DEC = DecimalType(38, 12)
    val cells = df
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n"))
    // n^alpha = exp(alpha * ln n): one fixed-order chain per source
    val term = exp((lit(alphaNum).cast(DoubleType) / lit(alphaDen)) *
      log(col("n").cast(DoubleType)))
    val tots = cells.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_total"),
      coalesce(sum(term.cast(DEC)), lit(0).cast(DEC)).as("z_d"))
    val out = cells.crossJoin(broadcast(tots))
    val w = term / col("z_d").cast(DoubleType)
    val budget = budgetTokens.map(lit(_)).getOrElse(col("n_total"))
      .cast(DoubleType)
    val epochs = w * budget / col("n").cast(DoubleType)
    out.select(
      col("source").as(sourceCol),
      col("n"),
      round(col("n").cast(DoubleType) / col("n_total").cast(DoubleType),
        roundTo).as("share_raw"),
      round(w, roundTo).as("weight"),
      round(epochs, roundTo).as("eff_epochs"),
      (epochs > lit(1.0)).as("upsampled"))
  }

  /** Fisher-style randomization test for a two-arm mean difference
    * (Fisher 1935; the add-one p of Phipson & Smyth 2010) — the
    * ASSUMPTION-FREE inference member of the experiment tier: the
    * Welch z in [[graft.operators.Experiment.diffInDiff]]-class
    * readouts leans on a normal approximation that is exactly wrong
    * on the heavy-tailed, zero-inflated metrics corpora produce; the
    * randomization test re-draws the ASSIGNMENT instead — under the
    * strong null (treatment does nothing) every re-randomized
    * |Δ_b| is exchangeable with the observed |Δ|, and
    * p = (1 + #{|Δ_b| ≥ |Δ|}) / (1 + B) bounds the error exactly,
    * no distributional assumption anywhere.
    *
    * Design note (documented, not hidden): each replicate re-assigns
    * every unit by an independent fair coin — the RE-RANDOMIZATION
    * test for Bernoulli(1/2) designs (exact when the real assignment
    * was a coin flip / parity hash, asymptotically equivalent to the
    * fixed-margin label permutation otherwise). Replicates drawing an
    * empty arm drop (probability 2^{1−n} — toy n only), and b_used
    * re-derives.
    *
    * Determinism (the [[poissonBootstrapMean]] discipline, zero RNG
    * state): replicate b's coin for unit id is the PARITY of the
    * [[avalanche]] uniform of id‖salt‖zeroPad3(b) — the digit fold
    * extends a staged [[polyFold]], so the corpus hashes each key once
    * and each replicate costs three fold steps + the mix. Exactness:
    * values integral (fail-loud micro-score convention); per-(b, arm)
    * sums exact Decimal(38,0); each Δ_b is ONE fixed-order double
    * chain of exact operands; the tail count compares those exact
    * doubles (identical cross-engine); `significant` is the EXACT
    * integer rule 20·(1+b_ge) ≤ (1+b_used) ⇔ p ≤ 0.05 — no float
    * threshold anywhere.
    *
    * Scale shape: the corpus is touched once as a narrow (hash, x,
    * arm) projection; the ×B fan-out collapses map-side into 2B
    * partial sums per partition (the bootstrap's shuffle shape — B·
    * partitions rows at ANY corpus size); everything after is ≤B rows.
    * Output ONE row: (n_treat, n_ctrl, mean_treat, mean_ctrl,
    * delta_obs, b_used, b_ge, p_two, significant); all test columns
    * NULL when either OBSERVED arm is empty or no replicate survives. */
  def permutationMeanDiff(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      treatCol: String,
      replicates: Int = 256,
      salt: String = "perm",
      roundTo: Int = 6): DataFrame = {
    require(replicates >= 8 && replicates <= 999,
      s"replicates $replicates outside [8, 999]")
    require(salt.forall(_ < 0x80), s"non-ASCII salt '$salt' breaks the byte fold")
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"permutationMeanDiff: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize (round(x*1e6) micro-score convention)")
    }
    val DEC0 = DecimalType(38, 0)
    val staged = df
      .select(col(idCol).cast("string").as("k"),
        col(valueCol).cast(LongType).as("x"), col(treatCol).as("g"))
      .where(col("k").isNotNull && col("x").isNotNull && col("g").isNotNull)
      .select(polyFold(concat(col("k"), lit(salt))).as("hf"),
        col("x"), col("g"))
    val base = staged.agg(
      coalesce(sum(when(col("g"), 1L).otherwise(0L)), lit(0L)).as("n_t"),
      coalesce(sum(when(!col("g"), 1L).otherwise(0L)), lit(0L)).as("n_c"),
      coalesce(sum(when(col("g"), col("x")).otherwise(0L)).cast(DEC0),
        lit(0).cast(DEC0)).as("sx_t"),
      coalesce(sum(when(!col("g"), col("x")).otherwise(0L)).cast(DEC0),
        lit(0).cast(DEC0)).as("sx_c"))
    // replicate coin: parity of avalanche(id, salt + "%03d".format(b))
    val f1 = (col("hf") * 31 + (expr("b DIV 100") + lit(48L))) % P
    val f2 = (f1 * 31 + (expr("(b DIV 10) % 10") + lit(48L))) % P
    val f3 = (f2 * 31 + (expr("b % 10") + lit(48L))) % P
    val u = ((f3 + MixA) * (f3 + MixB)) % P
    val arm = u % 2L === 1L
    val reps = staged
      .select(col("hf"), col("x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .select(col("b"), col("x"), arm.as("a"))
      .groupBy("b")
      .agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("rt"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("rc"),
        sum(when(col("a"), col("x")).otherwise(0L)).cast(DEC0).as("st"),
        sum(when(!col("a"), col("x")).otherwise(0L)).cast(DEC0).as("sc"))
      .where(col("rt") > 0L && col("rc") > 0L)
      .select(col("b"),
        (col("st").cast(DoubleType) / col("rt").cast(DoubleType) -
          col("sc").cast(DoubleType) / col("rc").cast(DoubleType)).as("d"))
    val obsD = col("sx_t").cast(DoubleType) / col("n_t").cast(DoubleType) -
      col("sx_c").cast(DoubleType) / col("n_c").cast(DoubleType)
    val withObs = reps.crossJoin(broadcast(
      base.where(col("n_t") > 0L && col("n_c") > 0L)
        .select(obsD.as("d_obs"))))
    val tail = withObs.agg(
      count(lit(1)).as("b_used"),
      coalesce(sum(when(abs(col("d")) >= abs(col("d_obs")), 1L)
        .otherwise(0L)), lit(0L)).as("b_ge"))
    val out = base.crossJoin(broadcast(tail))
    val tested = col("n_t") > 0L && col("n_c") > 0L && col("b_used") > 0L
    out.select(
      col("n_t").as("n_treat"), col("n_c").as("n_ctrl"),
      when(col("n_t") > 0L, round(
        col("sx_t").cast(DoubleType) / col("n_t").cast(DoubleType), roundTo))
        .as("mean_treat"),
      when(col("n_c") > 0L, round(
        col("sx_c").cast(DoubleType) / col("n_c").cast(DoubleType), roundTo))
        .as("mean_ctrl"),
      when(col("n_t") > 0L && col("n_c") > 0L, round(obsD, roundTo))
        .as("delta_obs"),
      when(tested, col("b_used")).as("b_used"),
      when(tested, col("b_ge")).as("b_ge"),
      when(tested, round((col("b_ge") + lit(1L)).cast(DoubleType) /
        (col("b_used") + lit(1L)).cast(DoubleType), roundTo)).as("p_two"),
      when(tested,
        lit(20L) * (col("b_ge") + lit(1L)) <= col("b_used") + lit(1L))
        .as("significant"))
  }
}
