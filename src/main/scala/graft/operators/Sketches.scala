package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable streaming-suitable sketches over the engine's avalanche hash
  * family — the constant-size summaries a 100 TB monitor actually ships:
  * both sketches here are MERGEABLE by construction (their build IS a
  * plain aggregation, so partial aggregates on executors / per-day
  * sketches union by re-aggregating), and both are DETERMINISTIC pure
  * functions of (data, salt, geometry) — unlike seed-dependent library
  * sketches, every estimate replays bit-identically in any engine with
  * int64 arithmetic (oracle-gated q146/q147).
  *
  * Position vs the built-ins: `approx_count_distinct` (HLL++) and
  * `percentile_approx` (KLL) remain the defaults inside one Spark job —
  * these sketches are for the CONTRACT seams: estimates that must be
  * reproducible across engines/runs, persisted and unioned across time
  * partitions, or audited against an exact replay.
  */
object Sketches {

  /** The avalanche modulus — hashes land uniformly in [0, P). */
  private[operators] val P = 1000000007L

  /** The KMV estimator expression, shared with [[Rollup.mergeRollup]] so a
    * merged rollup's estimate is definitionally the same function as
    * [[kmvDistinct]]'s: exact occupancy below k, else
    * n̂ = floor((k−1)·P/h_k) — floor, never round (a .5-tie on the
    * quotient would hit the engines' differing ROUND rules). */
  private[operators] def kmvEstimate(nSeen: Column, kthHash: Column, k: Int): Column =
    when(nSeen < k, nSeen)
      .otherwise(floor(lit((k - 1).toLong * 1.0) * lit(P.toDouble) /
        kthHash.cast("double")).cast("long"))

  /** The sketch family's hash, exposed for exact-replay comparisons
    * (count the distinct HASHES when auditing a [[kmvDistinct]]
    * estimate — key-vs-hash collision noise then cancels on both sides
    * of the audit). */
  def keyHash(key: Column, salt: String = ""): Column =
    Sampling.avalanche(key, salt)

  /** KMV (k-minimum-values / bottom-k) distinct-count sketch per group
    * (Bar-Yossef 2002): keep the k smallest DISTINCT hash values of the
    * key; with u_k = h_k/P the k-th smallest as a fraction, n̂ = (k−1)/u_k.
    * Groups with fewer than k distinct hashes report their EXACT count
    * (the standard small-cardinality fallback — the sketch holds every
    * hash it ever saw). Estimate uses floor, not round: a .5-tie on the
    * quotient would hit the engines' differing ROUND rules (the q144
    * lesson), and ±1 on an estimate is noise.
    *
    * Output: (groupCol, n_seen = sketch occupancy = min(k, distinct
    * hashes), kth_hash, est_distinct). Distinct KEYS ≈ distinct hashes
    * up to ~2⁻³⁰-per-pair
    * collisions on P ≈ 2³⁰ — the estimator's own error (~1/√k) dwarfs
    * that; the exactness contract is over HASHES, which is what both
    * engines replay.
    *
    * Scale shape: one distinct (group, hash) aggregation with map-side
    * combining (duplicate keys never travel), then the [[graft.plans.TopK]]
    * heap operator — each partition trims to k hashes per group BEFORE
    * the exchange, so the shuffle moves ≤ k·partitions rows per group;
    * state is k longs per group, never the key set. */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 2, s"k $k must be >= 2 (the estimator divides by k-1)")
    val hashes = df
      .select(col(groupCol).as("g"),
        Sampling.avalanche(col(keyCol), salt).as("h"))
      .distinct()
    val bottomK = graft.plans.TopK.perKey(
      hashes, Seq(col("g")), Seq(col("h").asc), k)
    bottomK.groupBy("g")
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_hash"))
      // n_seen < k ⇒ the sketch saw every distinct hash: exact count.
      // Otherwise n̂ = (k−1)·P / h_k, floored (integer-exact operands,
      // one quotient — identical double, identical floor in any engine).
      .select(col("g").as(groupCol),
        col("n_seen"),
        col("kth_hash"),
        kmvEstimate(col("n_seen"), col("kth_hash"), k).as("est_distinct"))
  }

  /** Count-min sketch (Cormode–Muthukrishnan 2005): a depth×width grid
    * of counters; key increments counter (j, avalanche(key, salt#j) mod
    * width) in every row j; a key's estimate is the MIN over its d
    * counters — always ≥ the true count (one-sided error, the property
    * monitors alert on safely), within εN with probability 1−δ for
    * width = e/ε, depth = ln(1/δ).
    *
    * Returns the SKETCH: (row, bucket, cnt) — depth·width rows, model-
    * sized, broadcastable, persistable beside the corpus, and mergeable
    * (union sketches of two time partitions = re-aggregate the grids).
    *
    * Scale shape: a keys×depth fan-out (narrow, depth ≤ ~5) into ONE
    * (row, bucket)-keyed aggregation with map-side combining — the
    * shuffle carries ≤ depth·width·partitions partial counters no matter
    * the corpus size. The sketch never holds keys. */
  def cmsSketch(
      df: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      salt: String = ""): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth $depth outside [1,16]")
    require(width >= 2, s"width $width must be >= 2")
    df.select(explode(array((0 until depth).map { j =>
        struct(lit(j).as("row"),
          (Sampling.avalanche(col(keyCol), s"$salt#$j") % width).as("bucket"))
      }: _*)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join output-size estimate from two [[cmsSketch]] grids — the
    * AGMS/count-min inner-product estimator (Alon–Matias–Szegedy lineage;
    * the CM form is Cormode–Muthukrishnan §4.3): |A ⋈ B on k| =
    * Σ_k fA(k)·fB(k), estimated as min over depth rows of
    * Σ_b cntA[row][b]·cntB[row][b]. Colliding keys only ADD mass, so
    * every row's dot ≥ the true inner product and the min stays
    * ONE-SIDED (est ≥ true join size, always — the safe direction for
    * the decision this feeds: "will this join explode?"). The planning
    * probe next to [[Skew.keySkewProfile]]: both run on yesterday's
    * partition sketches BEFORE committing a 100 TB join, and the grids
    * are constant-size, persistable, and mergeable across partitions.
    *
    * Both grids must share (depth, width, salt) — required, since
    * differing geometry silently estimates garbage; `depth` anchors the
    * row spine below, so a grid built at a LARGER depth than declared
    * has its extra rows ignored (and a smaller one contributes zero
    * dots — est 0 — rather than a silent wrong min). Rows and buckets
    * the grids don't share contribute ZERO to their dot — a depth row
    * with no bucket overlap proves the true join size is 0 and must
    * drive the min to 0, not silently drop out (grids only materialize
    * occupied cells). Cost: a depth·width-row equi-join + one
    * aggregation — model-sized, nothing corpus-scale moves. Returns one
    * row: (est_join_size), 0 for provably-empty joins, never NULL. */
  def cmsJoinSize(sketchA: DataFrame, sketchB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1, s"depth $depth must be >= 1")
    val spark = sketchA.sparkSession
    val a = sketchA.select(col("row"), col("bucket"), col("cnt").as("ca"))
    val b = sketchB.select(col("row"), col("bucket"), col("cnt").as("cb"))
    val dots = a.join(b, Seq("row", "bucket"))
      .groupBy("row")
      .agg(sum(col("ca") * col("cb")).as("dot"))
    spark.range(depth).select(col("id").cast("int").as("row"))
      .join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_size"))
  }

  /** Probe a [[cmsSketch]]: each probe key's estimate = min over the
    * depth rows of its counter. `sketch` is broadcast (depth·width
    * rows); probes stay distributed — the lookup is a narrow hash
    * projection + broadcast join + one (key)-keyed min. Estimates are
    * exact-deterministic, and `est ≥ true count` ALWAYS holds (asserted
    * in the spec and the q147 oracle). */
  def cmsEstimate(
      probes: DataFrame,
      sketch: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      salt: String = ""): DataFrame = {
    val lookups = probes.select(col(keyCol),
        explode(array((0 until depth).map { j =>
          struct(lit(j).as("row"),
            (Sampling.avalanche(col(keyCol), s"$salt#$j") % width).as("bucket"))
        }: _*)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    lookups.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      // an empty counter means the key was never seen: estimate 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Register bit budget for [[hllDistinct]]: the bucketed hash value
    * w = h div m is below P/16 < 2²⁷ for every supported m, so a
    * trailing-zero run never exceeds 26 and 27 marks "w = 0". */
  private val HllBits = 27

  /** HyperLogLog distinct-count sketch per group (Flajolet 2007) over
    * the PORTABLE avalanche hash — the constant-size counterpart of
    * [[kmvDistinct]] (m registers vs k hashes; HLL wins when sketches
    * are persisted/unioned across many partitions: 6 bits/register vs
    * 64 bits/hash). Every step is engine-exact:
    *
    *  - register j = h mod m; w = h div m; ρ = trailing-zeros(w) + 1
    *    (w = 0 ⇒ the 27-bit budget, [[HllBits]]). Trailing zeros come
    *    from `log2(w & −w)` — w & −w is an EXACT power of two, whose
    *    correctly-rounded log2 is an exact integer, re-pinned by
    *    round() against a 1-ulp-sloppy libm;
    *  - the harmonic denominator Σ 2^(−M_j) is carried as the SCALED
    *    EXACT INTEGER s_scaled = Σ 2^(27 − M_j) (each term ≥ 1, sum
    *    < m·2²⁷ — no floats, no order sensitivity);
    *  - the estimate α_m·m²·2²⁷ / s_scaled is one double division of
    *    exact integer operands (identical in any IEEE engine), rounded
    *    to 4.
    *
    * Registers merge by MAX, so the sketch is mergeable by
    * re-aggregation (union of time partitions = max per (group, j) —
    * the [[cmsSketch]] contract). The raw estimator is emitted without
    * the small-range linear-counting branch (its m·ln(m/V) is the one
    * non-portable term); v_zero is emitted so a caller can apply it —
    * for exact-replay small counts use [[kmvDistinct]], whose low range
    * is exact.
    *
    * Output: (groupCol, m, v_zero, s_scaled, est_hll). Scale shape: one
    * (group, register) max-aggregation (map-side combining; ≤ m rows per
    * group travel) + one group rollup — state is m 5-bit registers per
    * group, never the key set. */
  def hllDistinct(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      m: Int = 64,
      salt: String = ""): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ =>
        require(m >= 128 && m <= 16384 && (m & (m - 1)) == 0,
          s"m $m must be a power of two in [16, 16384]")
        0.7213 / (1.0 + 1.079 / m)
    }
    val h = Sampling.avalanche(col(keyCol), salt)
    val regs = df
      .select(col(groupCol).as("g"),
        pmod(h, lit(m.toLong)).as("j"),
        ZOrder.intDiv(h, lit(m.toLong)).as("w"))
      .select(col("g"), col("j"),
        when(col("w") === 0L, lit(HllBits))
          .otherwise((round(log2(col("w").bitwiseAND(-col("w")))) + 1)
            .cast("int")).as("rho"))
      .groupBy("g", "j").agg(max(col("rho")).as("mj"))
    regs.groupBy("g")
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"CAST(1 AS BIGINT) << ($HllBits - mj)")).as("s_present"))
      .select(col("g").as(groupCol),
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("n_regs")).as("v_zero"),
        (col("s_present") +
          (lit(m.toLong) - col("n_regs")) * lit(1L << HllBits)).as("s_scaled"))
      .withColumn("est_hll",
        round(lit(alpha * m * m) * lit((1L << HllBits).toDouble) /
          col("s_scaled").cast("double"), 4))
  }

  /** Distinct-key OVERLAP between every pair of groups via HLL sketch
    * algebra (inclusion–exclusion over max-merged registers):
    * |A∩B| ≈ Ê(A) + Ê(B) − Ê(A∪B), where the UNION's registers are the
    * per-register max of the two sketches — exact sketch algebra, no
    * union re-scan, the reason HLL is the persisted-summary standard.
    * The corpus is touched ONCE (one (group, register) max-aggregation,
    * [[hllDistinct]]'s pass); the pair join runs on the MODEL-SIZED
    * register frame (groups × m rows) — group count is slice-bounded by
    * contract (sources, langs, event types), never corpus-bounded.
    *
    * Every estimate is [[hllDistinct]]'s engine-exact arithmetic; the
    * overlap difference of three rounded estimates is clamped at 0
    * (inclusion–exclusion noise can dip negative on disjoint sets —
    * reported raw AND clamped, both deterministic).
    *
    * Output per unordered pair (ga < gb): (ga, gb, s_a, s_b, s_union —
    * the three scaled-integer harmonic sums, the exactness witnesses —
    * est_a, est_b, est_union, est_overlap). */
  def hllOverlap(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      m: Int = 64,
      salt: String = ""): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ =>
        require(m >= 128 && m <= 16384 && (m & (m - 1)) == 0,
          s"m $m must be a power of two in [16, 16384]")
        0.7213 / (1.0 + 1.079 / m)
    }
    val h = Sampling.avalanche(col(keyCol), salt)
    val regs = df
      .select(col(groupCol).as("g"),
        pmod(h, lit(m.toLong)).as("j"),
        ZOrder.intDiv(h, lit(m.toLong)).as("w"))
      .select(col("g"), col("j"),
        when(col("w") === 0L, lit(HllBits))
          .otherwise((round(log2(col("w").bitwiseAND(-col("w")))) + 1)
            .cast("int")).as("rho"))
      .groupBy("g", "j").agg(max(col("rho")).as("mj"))
    def sFromRegs(rf: DataFrame, mjCol: String): DataFrame =
      rf.groupBy(rf.columns.filter(c => c != "j" && c != mjCol).map(col): _*)
        .agg(count(lit(1)).as("__nr"),
          sum(expr(s"CAST(1 AS BIGINT) << ($HllBits - $mjCol)")).as("__sp"))
        .withColumn("__s", col("__sp") +
          (lit(m.toLong) - col("__nr")) * lit(1L << HllBits))
    def est(sCol: Column): Column =
      round(lit(alpha * m * m) * lit((1L << HllBits).toDouble) /
        sCol.cast("double"), 4)
    val perGroup = sFromRegs(regs, "mj").select(col("g"), col("__s").as("s_g"))
    // union registers per pair: DENSIFY each group's sparse register set
    // to all m indices first (absent register = 0) — a sparse join on
    // the register index alone would DROP a pair's register whenever
    // only one side has it set, silently counting it as zero — then one
    // equi-join on the register index aligns every group pair at every
    // register (groups² · m rows, model-sized), max per (pair, register)
    val dense = regs.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(0L), lit((m - 1).toLong))).as("j"))
      .join(regs, Seq("g", "j"), "left")
      .select(col("g"), col("j"), coalesce(col("mj"), lit(0)).as("mj"))
    val pairs = dense.toDF("ga", "j", "ma").join(
        dense.toDF("gb", "j", "mb"), Seq("j"))
      .where(col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("j"),
        greatest(col("ma"), col("mb")).as("mu"))
    val unionS = sFromRegs(pairs, "mu")
      .drop("__nr", "__sp")
      .withColumnRenamed("__s", "s_union")
    unionS
      .join(perGroup.toDF("ga", "s_a"), Seq("ga"))
      .join(perGroup.toDF("gb", "s_b"), Seq("gb"))
      .select(col("ga"), col("gb"), col("s_a"), col("s_b"), col("s_union"),
        est(col("s_a")).as("est_a"), est(col("s_b")).as("est_b"),
        est(col("s_union")).as("est_union"))
      .withColumn("est_overlap",
        greatest(round(col("est_a") + col("est_b") - col("est_union"), 4),
          lit(0.0)))
  }

  /** HDR-histogram bucket bounds of a non-negative int64 value column
    * (Tene's HdrHistogram design, the log-linear layout): values below
    * 2^subBits get EXACT width-1 buckets; above, the value's octave
    * [p2, 2·p2) splits into 2^subBits equal sub-buckets — relative
    * bucket width ≤ 2^−subBits everywhere. ALL INTEGER BIT ARITHMETIC:
    * the octave base p2 comes from a 6-step bit smear (v |= v≫1 …
    * v≫32, then (x≫1)+1), never a float log — floor(log2(v)) via libm
    * flips at octave boundaries under 1-ulp differences; the smear
    * cannot. Each smear step is its OWN projection (the column is
    * referenced twice per step; one nested expression would double the
    * tree 6× over and blow past janino's method limit — measured).
    * Returns `df` plus `lo`/`hi` columns. Negative values fail loud
    * (raise_error) — the layout has no sign octaves. */
  private[graft] def withHdrBounds(
      df: DataFrame, valueCol: String, subBits: Int): DataFrame = {
    val sub = 1L << subBits
    val staged = df
      .withColumn("__hv",
        when(col(valueCol).cast("long") < 0L,
          expr("CAST(raise_error('hdr: negative value - the layout has no sign octaves') AS BIGINT)"))
          .otherwise(col(valueCol).cast("long")))
      .withColumn("__hx", col("__hv"))
    val smeared = Seq(1, 2, 4, 8, 16, 32).foldLeft(staged) { (f, s) =>
      f.withColumn("__hx", col("__hx").bitwiseOR(shiftright(col("__hx"), s)))
    }
    smeared
      .withColumn("__hp2", shiftright(col("__hx"), 1) + 1)
      // greatest(·, 1): small-branch rows (v < 2^subBits) never USE the
      // sub-bucket, but the staged projection evaluates it on every row
      // — clamp the divisor so ANSI division never sees the 0 that only
      // those dead rows produce (big-branch p2 ≥ 2^subBits ⇒ unit ≥ 1)
      .withColumn("__hunit",
        greatest(shiftright(col("__hp2"), subBits), lit(1L)))
      .withColumn("__hsub",
        ZOrder.intDiv(col("__hv") - col("__hp2"), col("__hunit")))
      .withColumn("lo", when(col("__hv") < sub, col("__hv"))
        .otherwise(col("__hp2") + col("__hsub") * col("__hunit")))
      .withColumn("hi", when(col("__hv") < sub, col("__hv"))
        .otherwise(col("__hp2") + (col("__hsub") + 1) * col("__hunit") - 1))
      .drop("__hv", "__hx", "__hp2", "__hunit", "__hsub")
  }

  /** HDR-histogram sketch per group: (group, lo, hi, cnt) — model-sized
    * (≤ 2^subBits buckets per octave × ~37 octaves + the exact low
    * range), mergeable by re-aggregating counts, and EXACT-deterministic
    * (pure integer bucketing — see [[withHdrBounds]]). The production
    * quantile summary for persisted/unioned latency- and length-shaped
    * columns: a t-digest/KLL is merge-order-dependent, this is not. */
  def hdrHistogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits $subBits outside [1, 16]")
    // Integer-valued columns ONLY (r15, ADVICE — the Trend.cusum rule):
    // a silent cast("long") would TRUNCATE fractional values toward zero
    // (2.7 -> 2), inconsistent with the documented non-negative-int64
    // layout contract and with q223's round(v*1e6) pre-quantization.
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Sketches.hdrHistogram: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize fractional values with round(v * 10^d), " +
          "as q223 does with round(v*1e6)")
    }
    withHdrBounds(
        df.where(col(valueCol).isNotNull)
          .select(col(groupCol).as("g"), col(valueCol).cast("long").as("__v")),
        "__v", subBits)
      .groupBy("g", "lo", "hi").agg(count(lit(1)).as("cnt"))
  }

  /** Quantile readout over [[hdrHistogram]]: for each requested q, the
    * FIRST bucket (by lo) whose cumulative count reaches
    * k = max(1, ceil(q·n)) — the discrete k-th order statistic's bucket,
    * so bucket_lo ≤ exact-kth-value ≤ bucket_hi ALWAYS (the spec/oracle
    * assertion), with relative bucket width ≤ 2^−subBits. ceil(q·n)
    * follows the IEEE product convention (same double both engines; the
    * rank may differ by one from exact rational arithmetic when q·n is
    * integral, deterministically so — the q36 float-rule class).
    *
    * Scale shape: the histogram aggregation is the only corpus pass;
    * the cumulative window runs on the MODEL-SIZED bucket frame
    * (geometry-bounded rows per group, never corpus rows); quantiles
    * attach by exploding a literal array — a projection, no join. */
  def hdrQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[(String, Double)],
      subBits: Int = 5): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 },
      s"quantiles must be in [0,1]: $qs")
    val buckets = hdrHistogram(df, groupCol, valueCol, subBits)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("lo")
    val cum = buckets.withColumn("cum", sum(col("cnt")).over(w))
    val ns = cum.groupBy("g").agg(max(col("cum")).as("n"))
    val qArr = array(qs.map { case (name, q) =>
      struct(lit(name).as("q_name"), lit(q).as("q")) }: _*)
    cum.join(broadcast(ns), "g")
      .select(col("g"), col("lo"), col("hi"), col("cum"), col("n"),
        explode(qArr).as("qq"))
      .select(col("g"), col("lo"), col("hi"), col("cum"), col("n"),
        col("qq.q_name").as("q_name"), col("qq.q").as("q"))
      .where(col("cum") >= greatest(ceil(col("q") * col("n")), lit(1L)))
      .groupBy("g", "q_name", "q")
      .agg(max(col("n")).as("n"),
        min(struct(col("lo"), col("hi"))).as("b"))
      .select(col("g").as(groupCol), col("q_name"), col("q"), col("n"),
        col("b.lo").as("bucket_lo"), col("b.hi").as("bucket_hi"))
  }

  /** Portable Bloom membership sketch (Bloom 1970): the occupied-bit
    * set of an m-bit filter with `hashes` probes per key over the
    * avalanche family — bit i(key) = avalanche(key, salt#i) mod bits.
    * Returns the SKETCH: one BIGINT row per OCCUPIED bit (≤ bits rows,
    * model-sized, broadcastable, persistable beside the corpus) —
    * MERGEABLE by union+distinct (bitwise OR), the [[cmsSketch]]
    * re-aggregation contract for membership.
    *
    * Position vs the built-in: [[Decontaminate.overlapBloomPruned]]
    * rides Spark's own `BloomFilterAggregate` (the right default inside
    * one job); THIS sketch is for the contract seams — a filter that
    * must persist, union across time partitions, and replay
    * bit-identically in any engine with int64 arithmetic (the
    * q146/q147/q222 portability contract). Completes the portable tier:
    * cardinality (HLL/KMV), frequency (CMS), quantiles (HDR), moments
    * (AMS), membership (Bloom).
    *
    * Scale shape: a keys×hashes narrow fan-out into ONE distinct
    * (map-side partial dedup — duplicate bits never travel); the
    * shuffle carries ≤ bits·partitions rows no matter the corpus size.
    * The sketch never holds keys. */
  /** The count-conditional geometry rule for the Bloom family (the
    * q143 `scaledBuckets` / q149 `scaledCentroids` pattern applied to
    * membership): `bits = max(minBits, n·bitsPerKey)`. A PINNED bit
    * count saturates as n grows — at n ≫ m the fill fraction
    * 1−e^(−kn/m) → 1 and the false-positive rate (1−e^(−kn/m))^k → 1,
    * silently turning any `bloomContains` prefilter into a
    * pass-through (at 100 TB, the worst kind of quiet failure). A
    * CONSTANT bits-per-key holds the rate flat at every scale:
    * bitsPerKey = 10 realizes fpp ≈ 0.7% at the optimal k = m/n·ln2 ≈ 7
    * and ≈ 1.7% at this family's default k = 3 (the classic
    * m/n = −ln p / ln²2 sizing, Bloom 1970 — restated as a pure integer
    * rule so a SQL oracle replays it verbatim as
    * `GREATEST(minBits, COUNT(*) * bitsPerKey)`, never a
    * cross-engine `ln`). */
  def scaledBits(n: Long, bitsPerKey: Int = 10, minBits: Long = 2048L): Long = {
    require(n >= 0L && bitsPerKey >= 1 && minBits >= 2L,
      s"scaledBits(n=$n, bitsPerKey=$bitsPerKey, minBits=$minBits)")
    math.max(minBits, math.multiplyExact(n, bitsPerKey.toLong))
  }

  def bloomSketch(
      df: DataFrame,
      keyCol: String,
      bits: Long,
      hashes: Int,
      salt: String = ""): DataFrame = {
    require(bits >= 2, s"bits $bits must be >= 2")
    require(hashes >= 1 && hashes <= 16, s"hashes $hashes outside [1,16]")
    df.where(col(keyCol).isNotNull)
      .select(explode(array((0 until hashes).map { i =>
        (Sampling.avalanche(col(keyCol), s"$salt#$i") % bits).as(s"b$i")
      }: _*)).as("bit"))
      // an Aggregate, not distinct(): same batch result and plan shape,
      // but Deduplicate is not a streaming aggregation — as a groupBy
      // the SAME operator runs complete-mode under Structured Streaming
      // (the cmsSketch streaming-native contract, spec-gated)
      .groupBy("bit").agg(count(lit(1)).as("__n")).select("bit")
  }

  /** Membership probe over [[bloomSketch]]: a probe key "might be
    * contained" iff ALL `hashes` of its bit positions are occupied —
    * never a false negative (the Bloom guarantee, the property the
    * q229 gate asserts deterministically), false positives at the
    * classic (1−e^(−kn/m))^k rate.
    *
    * Scale shape: probes fan out ×hashes (narrow), the occupied-bit
    * frame joins BROADCAST (≤ bits rows — the lookup itself never
    * shuffles probes), and the per-probe hit count combines map-side so
    * the one exchange carries ≤ one row per probe (the per-probe output
    * is the floor any membership readout pays). */
  def bloomContains(
      probes: DataFrame,
      sketch: DataFrame,
      keyCol: String,
      bits: Long,
      hashes: Int,
      salt: String = ""): DataFrame = {
    require(bits >= 2, s"bits $bits must be >= 2")
    require(hashes >= 1 && hashes <= 16, s"hashes $hashes outside [1,16]")
    // defensive distinct: a caller merging sketches by plain union
    // (without the distinct) would otherwise double-join a duplicated
    // bit and flip sum(hit) === hashes into a FALSE NEGATIVE — the one
    // failure mode a Bloom filter must never have; the frame is
    // model-sized, the distinct is free
    val present = sketch.select(col("bit")).distinct()
      .select(col("bit"), lit(1L).as("hit"))
    probes
      .select(col(keyCol).as("k"),
        explode(array((0 until hashes).map { i =>
          (Sampling.avalanche(col(keyCol), s"$salt#$i") % bits).as(s"b$i")
        }: _*)).as("bit"))
      .join(broadcast(present), Seq("bit"), "left")
      .groupBy("k")
      .agg((coalesce(sum(col("hit")), lit(0L)) === hashes)
        .as("might_contain"))
      .select(col("k").as(keyCol), col("might_contain"))
  }

  /** AMS (Alon–Matias–Szegedy 1996) second-frequency-moment sketch: one
    * signed counter per (group, rep) — counter z_{g,r} = Σ_rows
    * sign_{g,r}(key) with sign = ±1 from the avalanche hash's parity, so
    * E[z²] = F₂ = Σ_k f_k² (the SELF-JOIN SIZE of the key column, the
    * quantity a shuffle planner needs before paying for the join the
    * [[cmsJoinSize]] grid estimates pairwise). depth·reps signed int64s
    * regardless of corpus size; MERGEABLE by construction — the sketch of
    * a union is the per-(grp, rep) SUM of the parts' counters, so per-day
    * sketches re-aggregate like [[cmsSketch]] grids.
    *
    * Returns the SKETCH: (grp, rep, z) — depth·reps rows. Deterministic
    * pure function of (data, salt, geometry): the sign is
    * `1 − 2·(avalanche(key, salt#i) mod 2)` with i = grp·reps + rep, so
    * any engine with int64 arithmetic replays every counter bit-exactly
    * (the q146/q147 portability contract).
    *
    * Scale shape: a keys×(depth·reps) narrow fan-out into ONE
    * (grp, rep)-keyed aggregation with map-side combining — the shuffle
    * carries ≤ depth·reps·partitions partial counters no matter the
    * corpus size. The sketch never holds keys. */
  def amsSketch(
      df: DataFrame,
      keyCol: String,
      depth: Int = 3,
      reps: Int = 8,
      salt: String = ""): DataFrame = {
    require(depth >= 1 && depth % 2 == 1 && depth <= 15,
      s"depth $depth must be odd in [1,15] (the estimator takes a median)")
    require(reps >= 1 && reps <= 64, s"reps $reps outside [1,64]")
    // the key's polynomial fold is STAGED once per row and extended per
    // cell with the short salt suffix (the h(key‖s) = fold(s over
    // h(key)) identity — bit-identical to hashing key‖salt#i whole, so
    // the SQL oracle's full-string fold replays unchanged), cutting the
    // per-row hash work from depth·reps full-key folds to one key fold
    // plus depth·reps suffix folds (the r15 ADVICE finding)
    val staged = df.where(col(keyCol).isNotNull)
      .select(Sampling.polyFold(col(keyCol)).as("hp"))
    // explicit fan-out before the depth·reps hash explosion: the
    // per-row work below is ×(depth·reps) avalanche folds and the
    // map-side combine runs INSIDE the scan stage — on a single-split
    // input (one parquet row group, the fixture layout) that whole
    // CPU bill lands in one task (q228 measured par≈1.9 on 32 cores).
    // One narrow (hp)-only shuffle buys full-width parallel hashing.
    // GATED on observed input parallelism (ADVICE r18): a well-split
    // production input (splits ≥ half the slot count) already hashes
    // full-width, so the extra round-robin exchange of the hp column is
    // pure cost there — skip it. The split proxy is inputFiles.length
    // (metadata-only, never a job): Dataset.rdd is NOT safe here — under
    // AQE it materializes the final plan, eagerly running every upstream
    // shuffle stage of an exchange-bearing input, which the later action
    // then pays AGAIN. A non-file input reports 0 files and keeps the
    // fan-out (the pre-gate unconditional behavior — wasteful at worst,
    // never wrong); sketch contents are partition-invariant
    // (spec-pinned), so the gate cannot change results.
    val target = df.sparkSession.sparkContext.defaultParallelism
    val inputParts =
      try math.max(df.inputFiles.length, 1) catch { case _: Throwable => 1 }
    val fanned =
      if (inputParts * 2 < target) staged.repartition(target) else staged
    fanned
      .select(explode(array((0 until depth * reps).map { i =>
        struct(lit(i / reps).as("grp"), lit(i % reps).as("rep"),
          (lit(1L) - lit(2L) *
            (Sampling.avalancheExtend(col("hp"), s"$salt#$i") % 2)).as("sign"))
      }: _*)).as("s"))
      .groupBy(col("s.grp").as("grp"), col("s.rep").as("rep"))
      .agg(sum(col("s.sign")).as("z"))
  }

  /** F₂ readout over [[amsSketch]]: the textbook median-of-means — mean
    * of z² within each group (variance ≤ 2F₂²/reps), median across the
    * odd `depth` groups (boosts the constant-probability bound). Output
    * one row (depth, reps, s_med, est_f2): s_med is the median group's
    * EXACT Σz² (decimal-exact integer — the cross-engine witness), est_f2
    * = s_med/reps as one double division; with the default power-of-two
    * reps the quotient is exact in binary, so no rounding is applied.
    *
    * Scale shape: pure arithmetic on the depth·reps-row sketch frame —
    * a single-partition sort of `depth` rows, never corpus data. */
  def amsF2(
      df: DataFrame,
      keyCol: String,
      depth: Int = 3,
      reps: Int = 8,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 0)
    val sk = amsSketch(df, keyCol, depth, reps, salt)
    val grpSums = sk
      .groupBy("grp")
      .agg(sum(col("z").cast(DEC) * col("z").cast(DEC)).as("s2"))
    // constant-but-unfoldable partition key (the q83 pmod idiom) — the
    // frame is `depth` rows; a bare lit(0) would constant-fold away
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("grp"), lit(1))).orderBy(col("s2"), col("grp"))
    grpSums
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === (depth + 1) / 2)
      .select(lit(depth.toLong).as("depth"), lit(reps.toLong).as("reps"),
        col("s2").as("s_med"),
        (col("s2").cast("double") / reps).as("est_f2"))
  }
}
