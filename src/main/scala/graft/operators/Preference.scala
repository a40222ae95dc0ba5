package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Pairwise-preference analysis — the RLHF/eval-data member of the
  * analytics tier: preference datasets (human A-vs-B choices, LLM-judge
  * verdicts, interleaving clicks) are PAIRS, and the question every
  * consumer asks — "what is each item's latent strength, on one scale"
  * — is the Bradley–Terry model's. Win RATES per pair don't compose
  * (item A can beat B 60% while losing the transitive comparison);
  * the BT maximum-likelihood strengths do.
  *
  * Reference scope: EXT (north-star surface); the reference engine has
  * no analytics operators.
  */
object Preference {

  /** Bradley–Terry strengths via Hunter's MM iteration (Bradley & Terry
    * 1952; Hunter 2004's minorization–maximization — the standard
    * fitting loop, monotone in likelihood): fixed `iters` rounds of
    *   s_i ← W_i / Σ_j n_ij / (s_i + s_j),
    * renormalized each round to mean 1 (the scale is otherwise
    * unidentified). A FIXED round count is the determinism contract
    * (the L144 LPA / L154 PCA loop discipline — convergence-threshold
    * loops are order- and platform-dependent; a pinned round count is a
    * pure function of the pair multiset and SQL-replays round by
    * round).
    *
    * Input: one row per ORDERED game (winnerCol, loserCol). Exactness:
    * the pair census (n_ij games per unordered pair, W_i wins per item)
    * is exact longs off ONE aggregation; each round's denominator terms
    * n_ij/(s_i+s_j) are doubles from one fixed-order chain accumulating
    * as Decimal(38,12) per item (ORDER-INSENSITIVE — the cross-pair sum
    * is the only place float order could creep in); the normalizer
    * likewise; strengths round only at OUTPUT. Items that never lose
    * (or never win) have no finite MLE (Ford 1957's connectivity
    * condition) — they surface with their diverging trajectory after
    * `iters` rounds, documented, never silently clamped; the spec pins
    * the behavior.
    *
    * Scale shape: ONE corpus pass to the (i, j, n, w) pair-census frame
    * — the ONLY corpus-touching step; items are a model-sized
    * vocabulary by contract (sources, models, policies — fail-loud at
    * `maxItems`, the MMR-pool contract class), so the census collects
    * as MODEL STATE and the MM rounds run on the driver exactly like
    * [[Similarity.kMeansCentroids]]' centroid updates — a plan-free
    * loop (a DataFrame-per-round formulation nests the plan tree
    * exponentially in `iters`; measured analyzer OOM at 8 rounds), with
    * BigDecimal term sums reproducing the Decimal(38,12) replay
    * bit-for-bit. Output one row per item:
    * (item, n_games, n_wins, strength, rank). */
  def bradleyTerry(
      df: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 8,
      maxItems: Int = 4096,
      roundTo: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters $iters outside [1, 64]")
    require(maxItems >= 2 && maxItems <= 65536,
      s"maxItems $maxItems outside [2, 65536]")
    val spark = df.sparkSession
    import spark.implicits._
    val games = df
      .where(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).cast("string").as("wi"),
        col(loserCol).cast("string").as("li"))
    // unordered pair census — exact longs, the one corpus pass
    val pairsDf = games
      .select(least(col("wi"), col("li")).as("a"),
        greatest(col("wi"), col("li")).as("b"),
        when(col("wi") < col("li"), 1L).otherwise(0L).as("aw"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"), sum(col("aw")).as("wa"))
    // model-state collect, fail-loud at the items contract
    val pairs = pairsDf.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val itemSet = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    require(itemSet.length <= maxItems,
      s"bradleyTerry: ${itemSet.length} items exceed maxItems $maxItems — " +
        "the item vocabulary must be model-sized (sources, models, " +
        "policies), not a corpus key")
    val wins = scala.collection.mutable.Map(itemSet.map(_ -> 0L): _*)
    val nGames = scala.collection.mutable.Map(itemSet.map(_ -> 0L): _*)
    pairs.foreach { case (a, b, n, wa) =>
      wins(a) += wa; wins(b) += n - wa
      nGames(a) += n; nGames(b) += n
    }
    val k = itemSet.length
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var s = itemSet.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      // Decimal(38,12) term accumulation — BigDecimal is exact, so the
      // sum is order-insensitive and replays the SQL verbatim
      val den = scala.collection.mutable.Map(
        itemSet.map(_ -> BigDecimal(0)): _*)
      pairs.foreach { case (a, b, n, _) =>
        val term = dec12(n.toDouble / (s(a) + s(b)))
        den(a) += term; den(b) += term
      }
      val raw = itemSet.map(i => i -> (wins(i).toDouble / den(i).toDouble))
        .toMap
      val z = itemSet.map(i => dec12(raw(i))).sum
      s = itemSet.map(i => i -> raw(i) * k.toDouble / z.toDouble).toMap
    }
    val ranked = itemSet
      .map(i => (i, nGames(i), wins(i), s(i)))
      .sortBy { case (i, _, _, st) => (-st, i) }
      .zipWithIndex
      .map { case ((i, g, w, st), r) =>
        (i, g, w,
          BigDecimal.valueOf(st).setScale(roundTo,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.toLong + 1L)
      }
    ranked.toSeq.toDF("item", "n_games", "n_wins", "strength", "rank")
  }

  /** DuckDB replay of [[bradleyTerry]] — one MATERIALIZED CTE block per
    * MM round (the pcaSqlCtes one-source-of-truth rule; plain CTEs
    * re-inline per reference and the round chain would re-evaluate
    * exponentially). `gamesCte` must define games(wi, li). */
  def bradleyTerrySql(gamesCte: String, iters: Int, roundTo: Int = 6): String = {
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""d$r AS MATERIALIZED (
         |  SELECT item, COALESCE(SUM(CAST(CAST(n AS DOUBLE) / (sa + sb)
         |    AS DECIMAL(38,12))), 0) AS den
         |  FROM (
         |    SELECT p.a AS item, p.n, si.s AS sa, sj.s AS sb
         |    FROM pairs p JOIN $prev si ON si.item = p.a
         |                 JOIN $prev sj ON sj.item = p.b
         |    UNION ALL
         |    SELECT p.b AS item, p.n, si.s AS sa, sj.s AS sb
         |    FROM pairs p JOIN $prev si ON si.item = p.a
         |                 JOIN $prev sj ON sj.item = p.b)
         |  GROUP BY item),
         |r$r AS MATERIALIZED (
         |  SELECT i.item, CAST(i.n_wins AS DOUBLE) / CAST(d$r.den AS DOUBLE)
         |    AS sr
         |  FROM items i JOIN d$r ON d$r.item = i.item),
         |z$r AS (SELECT COALESCE(SUM(CAST(sr AS DECIMAL(38,12))), 0) AS z_d
         |  FROM r$r),
         |s$r AS MATERIALIZED (
         |  SELECT item, sr * (SELECT CAST(k AS DOUBLE) FROM kk) /
         |    CAST((SELECT z_d FROM z$r) AS DOUBLE) AS s
         |  FROM r$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gamesCte,
       |pairs AS MATERIALIZED (
       |  SELECT LEAST(wi, li) AS a, GREATEST(wi, li) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN wi < li THEN 1 ELSE 0 END) AS BIGINT) AS wa
       |  FROM games WHERE wi IS NOT NULL AND li IS NOT NULL AND wi <> li
       |  GROUP BY 1, 2),
       |items AS MATERIALIZED (
       |  SELECT item, CAST(SUM(n) AS BIGINT) AS n_games,
       |    CAST(SUM(w) AS BIGINT) AS n_wins
       |  FROM (SELECT a AS item, n, wa AS w FROM pairs
       |        UNION ALL
       |        SELECT b AS item, n, n - wa AS w FROM pairs)
       |  GROUP BY 1),
       |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
       |s0 AS (SELECT item, 1.0 AS s FROM items),
       |$rounds
       |SELECT i.item, i.n_games, i.n_wins,
       |  ROUND(f.s, $roundTo) AS strength,
       |  CAST(ROW_NUMBER() OVER (ORDER BY f.s DESC, i.item) AS BIGINT) AS rank
       |FROM items i JOIN s$iters f ON f.item = i.item
       |ORDER BY rank""".stripMargin
  }
}
