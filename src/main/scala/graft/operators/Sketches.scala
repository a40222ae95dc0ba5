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
}
