package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi–Sunter (1969), the canonical
  * entity-resolution decision model and the structured-data counterpart
  * of this package's text/embedding dedup: candidate pairs (from any
  * blocking strategy — equi-key blocks, [[Dedup]] sorted neighborhoods)
  * score as a sum of per-field evidence weights, agreement on field i
  * contributing log₂(mᵢ/uᵢ) and disagreement log₂((1−mᵢ)/(1−uᵢ)), where
  * mᵢ = P(agree | same entity) and uᵢ = P(agree | different entities).
  * Two thresholds split the score line into match / possible (clerical
  * review) / non-match — the published decision geometry.
  *
  * Determinism contract: the m/u parameters are MODEL CONFIG (estimated
  * offline — EM fitting is a separate concern), so both weights per
  * field are computed once on the DRIVER, rounded to 6 decimals, and
  * embedded as plan literals. The per-pair score is then a fixed-order
  * sum of ≤|rules| literal doubles — no libm call anywhere in either
  * engine's plan, bit-identical cross-engine by IEEE addition alone
  * (q155 interpolates the SAME driver-computed literals into the SQL).
  *
  * Scale shape: pure narrow per-pair projection — cost rides on the
  * caller's blocking (the candidate count), never on this scoring. */
object Linkage {

  /** One field comparison: `agree` is any boolean Column over the pair
    * frame (exact equality, normalized equality, a similarity threshold
    * — the caller's comparator), with its m/u parameters. */
  final case class FieldRule(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"field $name: m=$m, u=$u must be strict probabilities in (0,1)")
    require(m > u,
      s"field $name: m=$m must exceed u=$u (agreement must be evidence FOR a match)")
    private def log2(x: Double): Double = math.log(x) / math.log(2.0)
    private def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    /** Driver-computed, 6-decimal-rounded evidence weights (plan literals). */
    val agreeWeight: Double = r6(log2(m / u))
    val disagreeWeight: Double = r6(log2((1 - m) / (1 - u)))
  }

  /** Score candidate pairs and classify. Appends, per rule, a boolean
    * `agree_<name>` column, then `score` (the fixed-order literal-weight
    * sum, 6 decimals) and `decision`: score ≥ upper → 'match',
    * score > lower → 'possible', else 'nonmatch'. NULL field values
    * count as disagreement (no evidence ≠ evidence — the conservative
    * published convention). */
  def fellegiSunter(
      pairs: DataFrame,
      rules: Seq[FieldRule],
      upper: Double,
      lower: Double): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    require(upper >= lower, s"upper $upper must be >= lower $lower")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val flagged = rules.foldLeft(pairs) { case (acc, r) =>
      acc.withColumn(s"agree_${r.name}", coalesce(r.agree, lit(false)))
    }
    val score = rules.map { r =>
      when(col(s"agree_${r.name}"), lit(r.agreeWeight)).otherwise(lit(r.disagreeWeight))
    }.reduce(_ + _)
    flagged
      .withColumn("score", round(score, 6))
      .withColumn("decision",
        when(col("score") >= upper, lit("match"))
          .when(col("score") > lower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }
}
