package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys (SURVEY.md "Optimize for scale":
  * skewed keys → salting or AQE skew-join).
  *
  * AQE's skew-join splitting already rescues sort-merge joins at runtime
  * (enabled in GraftSession); explicit salting remains the tool when (a)
  * the join feeds a hash aggregate keyed on the hot key, so the skew
  * re-appears after the join, or (b) the layout must be deterministic
  * (bucketed outputs). Salting rewrites
  *   big ⋈ small ON k  ⇒  (big + salt) ⋈ (small × saltFactor) ON (k, salt)
  * which fans every hot key across `saltFactor` reducers; results are
  * identical to the plain join (verified in SkewSpec).
  */
object Skew {

  /** Inner equi-join with the big side salted. The big side gets a
    * partition-local row-index salt (any distribution is correct — salt
    * only spreads execution); the small side replicates saltFactor×. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val b = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val s = small.withColumn("__salt2",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    b.join(s, col("__salt") === col("__salt2") && col(bigKey) === col(smallKey))
      .drop("__salt", "__salt2")
  }

  /** Skew DIAGNOSIS — the planning step before [[saltedJoin]] (or before
    * trusting AQE): measure how concentrated a prospective shuffle key
    * is, and what salt factor would level it. At 100 TB you run this on
    * a sample or yesterday's partition BEFORE committing a join layout;
    * the output is one row per analyzed frame, broadcast-sized.
    *
    * Output (single row):
    *  - `n_rows`, `n_keys` — totals;
    *  - `max_freq`, `top_key` — the hottest key and its count (ties by
    *    smallest key string — deterministic);
    *  - `avg_freq` — n_rows/n_keys, rounded (genuine quotient);
    *  - `skew_ratio` — max_freq/avg_freq rounded; ~1 means level, ≥ ~10
    *    means the hottest reducer does 10× the average's work;
    *  - `recommended_salt` — min(ceil(max_freq·targetTasks/n_rows),
    *    ceil(skew_ratio)), floored at 1: the fan-out that caps the
    *    hottest key at one fair task share, but never beyond what levels
    *    it to the AVERAGE key (past that point the other keys dominate
    *    the reducers and further splitting buys nothing — so a level
    *    frame recommends 1 even when targetTasks ≫ n_keys).
    *
    * Scale shape: ONE (key) aggregation with map-side combining, then a
    * 1-row reduction (max_by + sums) — the frequency frame never leaves
    * the cluster, no sort, no window. The key travels as a string (the
    * diagnostic's currency — this is a planning probe, not a hot path).
    */
  def keySkewProfile(
      df: DataFrame,
      keyCol: String,
      targetTasks: Int = 200): DataFrame = {
    require(targetTasks >= 1, s"targetTasks $targetTasks must be >= 1")
    val freq = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("f"))
    freq.agg(
        sum(col("f")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("f")).as("max_freq"),
        min_by(col("k"), struct(negate(col("f")), col("k"))).as("top_key"))
      .select(col("n_rows"), col("n_keys"), col("max_freq"), col("top_key"),
        round(col("n_rows").cast("double") / col("n_keys"), 4).as("avg_freq"),
        round(col("max_freq") * col("n_keys").cast("double") / col("n_rows"), 4)
          .as("skew_ratio"),
        greatest(lit(1L), least(
          ceil(col("max_freq").cast("double") * targetTasks / col("n_rows")),
          ceil(col("max_freq") * col("n_keys").cast("double") / col("n_rows")))
          .cast("long")).as("recommended_salt"))
  }
}
