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
}
