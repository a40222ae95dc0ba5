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

  /** EM-fitted linkage parameters: the match-class prior `p` and, per
    * field, (name, m, u) — [[fitEm]]'s output, ready to become
    * [[FieldRule]]s via [[toRules]]. */
  final case class EmEstimate(p: Double, fields: Seq[(String, Double, Double)])

  /** Estimate m/u (and the match prior) from UNLABELED candidate pairs —
    * the classical EM fit over agreement patterns (Winkler 1988, "Using
    * the EM algorithm for weight computation in the Fellegi–Sunter model
    * of record linkage"): latent 2-class mixture (match/non-match) with
    * conditionally independent field agreements. This closes the loop the
    * scoring operator leaves open — a user WITHOUT labeled data derives
    * the parameters [[fellegiSunter]] requires from the candidate set
    * itself.
    *
    * Scale shape: ONE corpus-scale aggregation — candidate pairs
    * collapse to agreement-pattern counts (groupBy over K booleans,
    * map-side combining; at most 2^K ≤ 65536 rows for the enforced
    * K ≤ 16). All EM iterations then run on the DRIVER over that
    * model-sized pattern table: zero further cluster traffic, the
    * BPE-argmax/codebook bounded-driver-state shape. This beats an
    * aggregation per iteration outright — the sufficient statistics of
    * the whole EM trajectory are the pattern counts.
    *
    * Determinism: pattern counts are exact integers (partitioning-
    * invariant), patterns iterate in canonical bit order, and the EM
    * arithmetic is fixed-order driver doubles — the fit is a pure
    * function of the candidate set (spec-asserted, incl. against an
    * independent per-pair sequential reference).
    *
    * NULL agreements count as disagreement ([[fellegiSunter]]'s
    * convention). Estimates are clamped to [eps, 1−eps] each M-step
    * (degenerate fields would otherwise collapse to 0/1 and produce
    * infinite weights). Label identification: with m0 > u0 the match
    * class keeps the high-agreement role; if a field still fits m ≤ u
    * (agreement anti-correlated with the latent match class), [[toRules]]
    * rejects it by the FieldRule contract rather than shipping a rule
    * whose "agreement" is evidence against. */
  def fitEm(
      pairs: DataFrame,
      fields: Seq[(String, Column)],
      iters: Int = 20,
      p0: Double = 0.1,
      m0: Double = 0.9,
      u0: Double = 0.1,
      eps: Double = 1e-6): EmEstimate = {
    require(fields.nonEmpty, "fitEm: at least one field required")
    require(fields.size <= 16,
      s"fitEm: ${fields.size} fields > 16 — the 2^K pattern table must stay driver-bounded")
    require(fields.map(_._1).distinct.size == fields.size, "fitEm: duplicate field names")
    require(iters >= 1, s"fitEm: iters $iters must be >= 1")
    require(eps > 0 && eps < 0.5, s"fitEm: eps $eps outside (0, 0.5)")
    for ((x, what) <- Seq((p0, "p0"), (m0, "m0"), (u0, "u0")))
      require(x > 0 && x < 1, s"fitEm: $what $x must be a strict probability")
    val k = fields.size
    val gCols = fields.map { case (n, c) => coalesce(c, lit(false)).as(s"g_$n") }
    val rows = pairs.select(gCols: _*)
      .groupBy(fields.map(f => col(s"g_${f._1}")): _*)
      .agg(count(lit(1)).as("n"))
      .collect()
    require(rows.nonEmpty, "fitEm: no candidate pairs")
    // canonical bit order → fixed summation order → deterministic fit
    val patterns = rows.map { r =>
      (Array.tabulate(k)(i => r.getBoolean(i)), r.getLong(k))
    }.sortBy { case (g, _) => g.map(b => if (b) '1' else '0').mkString }
    val total = patterns.map(_._2).sum.toDouble
    def clamp(x: Double): Double = math.min(1.0 - eps, math.max(eps, x))
    var p = p0
    val m = Array.fill(k)(m0)
    val u = Array.fill(k)(u0)
    var it = 0
    while (it < iters) {
      var sw = 0.0
      var su = 0.0
      val swg = new Array[Double](k)
      val sug = new Array[Double](k)
      patterns.foreach { case (g, n) =>
        var pm = p
        var pu = 1.0 - p
        var i = 0
        while (i < k) {
          pm *= (if (g(i)) m(i) else 1.0 - m(i))
          pu *= (if (g(i)) u(i) else 1.0 - u(i))
          i += 1
        }
        val w = pm / (pm + pu)
        sw += n * w
        su += n * (1.0 - w)
        i = 0
        while (i < k) {
          if (g(i)) { swg(i) += n * w; sug(i) += n * (1.0 - w) }
          i += 1
        }
      }
      p = clamp(sw / total)
      var i = 0
      while (i < k) {
        m(i) = clamp(swg(i) / sw)
        u(i) = clamp(sug(i) / su)
        i += 1
      }
      it += 1
    }
    EmEstimate(p, fields.zipWithIndex.map { case ((n, _), i) => (n, m(i), u(i)) })
  }

  /** [[fitEm]] output → [[FieldRule]]s over the same agreement columns,
    * ready for [[fellegiSunter]]. Fails loud (the FieldRule contract) on
    * any field whose fitted m ≤ u. */
  def toRules(fit: EmEstimate, fields: Seq[(String, Column)]): Seq[FieldRule] = {
    val mu = fit.fields.map { case (n, m, u) => n -> ((m, u)) }.toMap
    fields.map { case (n, c) =>
      val (m, u) = mu.getOrElse(n,
        throw new IllegalArgumentException(s"toRules: field $n not in the fit"))
      FieldRule(n, c, m, u)
    }
  }

  /** Candidate generation with a BOUNDED per-block pair budget — the
    * guard the r12 10×-scale study demanded: equi-key blocking emits
    * nl·nr pairs per block, so low-cardinality blocking keys (the
    * fixture's 125 nation×segment blocks) make candidate volume
    * QUADRATIC in corpus size while every downstream cost rides on it
    * (q155/q165 measured 58×/41× at 10× data — candidates, not the
    * scorer, were the scale killer). This operator counts block sizes
    * FIRST (one aggregation per side — the keySkewProfile read), then:
    *
    *  - blocks with nl·nr ≤ `maxBlockPairs` take the full cross
    *    (exactly the plain equi-join's output for those blocks);
    *  - larger blocks AUTO-SWITCH to sorted-neighborhood WITHIN the
    *    block (the L48 machinery, merge/purge inside a block): both
    *    sides interleave in one (sortKey, side) order and only
    *    cross-side rows within `window` sorted positions pair —
    *    per-block volume drops from nl·nr to ≤ (nl+nr)·window.
    *
    * The switch is a pure function of block counts, so the whole
    * candidate set stays deterministic and SQL-replayable at any scale
    * (q155/q165 interpolate the same rule). Recall contract, stated
    * plainly: in oversized blocks only pairs whose sort keys land
    * within `window` interleaved positions are candidates — choose
    * `sortKeyLeft/Right` so true matches sort together (the
    * merge/purge key-design rule), and make each UNIQUE per row
    * (ties would make ranks engine-dependent); uniqueness of
    * (key, side) is what makes the interleaved order total. Sort keys
    * must be STRING-typed (required at runtime): the SQL replay orders
    * by the same expression verbatim, and lexical-vs-native order is
    * the one place the two engines could silently diverge — encode
    * numerics zero-padded if positional order must be numeric.
    *
    * Scale shape: two grouped counts + one broadcast-or-shuffle
    * semi-join split; the full-cross part is the plain equi-join on
    * calm blocks; the windowed part ranks each oversized block with
    * ONE window sort (O(n log n) per block vs the n² cross it
    * replaces; at 100 TB a block that cannot sort on one task should
    * get a finer blocking key — the require message says so) and
    * probes rank-blocks of `window` positions, an EQUI-join (the
    * sortedNeighborhoodPairs idiom — no nested-loop anywhere).
    *
    * Output: left.* ++ right.* (the equi-join's shape); column names
    * must be disjoint across sides. */
  def boundedBlockedPairs(
      left: DataFrame,
      right: DataFrame,
      blockKeys: Seq[(String, String)],
      sortKeyLeft: Column,
      sortKeyRight: Column,
      maxBlockPairs: Long = 100000L,
      window: Int = 32): DataFrame = {
    require(blockKeys.nonEmpty, "boundedBlockedPairs: at least one block key")
    require(maxBlockPairs >= 1L,
      s"boundedBlockedPairs: maxBlockPairs $maxBlockPairs must be >= 1")
    require(window >= 1, s"boundedBlockedPairs: window $window must be >= 1")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"boundedBlockedPairs: column names overlap: ${lCols.intersect(rCols).mkString(", ")}")
    // Sort keys must be STRING-typed, validated UNCONDITIONALLY (not
    // just on the hot path): the windowed ranking orders by __sk, and
    // boundedBlockedSqlCtes replays that order with the raw SQL
    // expression — a silent cast would order '10' < '9' while the
    // oracle orders natively. Fail loud instead (r14, ADVICE).
    val lSkType = left.select(sortKeyLeft.as("__sk")).schema.head.dataType
    val rSkType = right.select(sortKeyRight.as("__sk")).schema.head.dataType
    require(lSkType == org.apache.spark.sql.types.StringType &&
      rSkType == org.apache.spark.sql.types.StringType,
      s"boundedBlockedPairs: sort keys must be STRING (got $lSkType/$rSkType) — " +
        "lexical order is the operator's replay contract; cast explicitly " +
        "with a collation-stable encoding (e.g. zero-padded numerics) if needed")
    val lk = blockKeys.map(_._1)
    val rk = blockKeys.map(_._2)
    val bk = lk.indices.map(i => s"__bk_$i")
    def keyed(df: DataFrame, keys: Seq[String]): DataFrame =
      df.select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__bk_$i") }
        ++ df.columns.map(col): _*)
    val lKeyed = keyed(left, lk)
    val rKeyed = keyed(right, rk)
    // block-count-sized; materialized ONCE (eager, lineage-free) — the
    // isEmpty probe, the calm semi-joins and the hot semi-joins all read
    // these blocks instead of each re-running the two corpus-scale
    // grouped counts (the probe would otherwise triple-scan both
    // inputs); blocks are ContextCleaner-released when the caller drops
    // the returned frame (the connectedComponents label contract)
    val sizes = lKeyed.groupBy(bk.map(col): _*).agg(count(lit(1)).as("__nl"))
      .join(rKeyed.groupBy(bk.map(col): _*).agg(count(lit(1)).as("__nr")), bk.toSeq)
      .select(bk.map(col) :+ (col("__nl") * col("__nr")).as("__np"): _*)
      .localCheckpoint(true)
    val calm = sizes.where(col("__np") <= maxBlockPairs).select(bk.map(col): _*)
    val hot = sizes.where(col("__np") > maxBlockPairs).select(bk.map(col): _*)
    val outCols = (lCols ++ rCols).map(col)
    // EAGER hot-set probe (one job over two map-side-combined grouped
    // counts — block-count-sized traffic): with no oversized block the
    // whole guard is a no-op and the plan IS the plain equi-join —
    // no semi-join split, no empty windowed branch. The common calm
    // case (every fixture gate) pays only the tiny count job; the
    // split/window machinery plans only when it will actually run.
    // Still a pure function of the input block counts — determinism
    // and the SQL replay rule are unchanged.
    if (hot.isEmpty) {
      return left.join(right,
        lk.zip(rk).map { case (a, b) => col(a) === col(b) }.reduce(_ && _))
        .select(outCols: _*)
    }
    val fullPart = lKeyed.join(calm, bk.toSeq, "left_semi")
      .join(rKeyed.join(calm, bk.toSeq, "left_semi").drop(bk: _*),
        lk.zip(rk).map { case (a, b) => col(a) === col(b) }.reduce(_ && _))
      .select(outCols: _*)
    // windowed part: interleave both sides of each hot block in one
    // (sortKey, side) order, rank, then pair cross-side rows within
    // `window` positions via the rank-block probe (equi-join on
    // (block, rank div window), each row probing its block and the
    // next — every ≤window-apart pair meets exactly once)
    val lt = lKeyed.join(hot, bk.toSeq, "left_semi")
      .withColumn("__sk", sortKeyLeft)
      .withColumn("__side", lit(0))
      .withColumn("__lp", struct(lCols.map(col): _*))
      .select(bk.map(col) ++ Seq(col("__sk"), col("__side"), col("__lp")): _*)
    val rt = rKeyed.join(hot, bk.toSeq, "left_semi")
      .withColumn("__sk", sortKeyRight)
      .withColumn("__side", lit(1))
      .withColumn("__rp", struct(rCols.map(col): _*))
      .select(bk.map(col) ++ Seq(col("__sk"), col("__side"), col("__rp")): _*)
    val u = lt.unionByName(rt, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bk.map(col): _*).orderBy(col("__sk"), col("__side"))
    val ranked = u.withColumn("__rk", row_number().over(w))
    val probes = ranked.withColumn("__jblk",
      explode(array(ZOrder.intDiv(col("__rk"), lit(window.toLong)),
        ZOrder.intDiv(col("__rk"), lit(window.toLong)) + 1)))
    val a = probes.select(
      bk.map(col) ++ Seq(col("__jblk"), col("__rk").as("__rka"),
        col("__side").as("__sa"), col("__lp").as("__lpa"), col("__rp").as("__rpa")): _*)
    val b = ranked.select(
      bk.map(c => col(c).as(s"${c}_b")) ++ Seq(
        ZOrder.intDiv(col("__rk"), lit(window.toLong)).as("__jblk_b"),
        col("__rk").as("__rkb"), col("__side").as("__sb"),
        col("__lp").as("__lpb"), col("__rp").as("__rpb")): _*)
    val joined = a.join(b,
      bk.map(c => col(c) === col(s"${c}_b")).reduce(_ && _) &&
        col("__jblk") === col("__jblk_b") &&
        col("__rkb") > col("__rka") &&
        col("__rkb") <= col("__rka") + window &&
        col("__sa") =!= col("__sb"))
    val windowPart = joined.select(
      when(col("__sa") === 0, col("__lpa")).otherwise(col("__lpb")).as("__L"),
      when(col("__sa") === 1, col("__rpa")).otherwise(col("__rpb")).as("__R"))
      .select(col("__L.*"), col("__R.*"))
      .select(outCols: _*)
    fullPart.unionByName(windowPart)
  }

  /** The DuckDB replay of [[boundedBlockedPairs]], generated from the
    * same rule (the kCenterSqlCtes / mergesSqlCtes one-source-of-truth
    * discipline — q155/q165/q201 interpolate THIS block instead of
    * hand-copying the ~35-line CTE chain three times): block counts,
    * the np ≤ cap full-cross part, and the windowed sorted-neighborhood
    * part over oversized blocks, ending in a CTE named `${prefix}cand`
    * whose columns are payloadLeft ++ payloadRight.
    *
    * `leftTable`/`rightTable` are table or prior-CTE names;
    * `sortKeyLeft/Right` are SQL expressions over the respective
    * table's columns (UNIQUE per row — the operator's contract);
    * `idLeft/idRight` are unique join-back keys contained in the
    * payloads. */
  def boundedBlockedSqlCtes(
      leftTable: String,
      rightTable: String,
      blockKeys: Seq[(String, String)],
      sortKeyLeft: String,
      sortKeyRight: String,
      idLeft: String,
      idRight: String,
      payloadLeft: Seq[String],
      payloadRight: Seq[String],
      maxBlockPairs: Long,
      window: Int,
      prefix: String = ""): String = {
    require(blockKeys.nonEmpty, "boundedBlockedSqlCtes: at least one block key")
    require(payloadLeft.contains(idLeft) && payloadRight.contains(idRight),
      "boundedBlockedSqlCtes: payloads must contain the join-back ids")
    val p = prefix
    val bkAlias = blockKeys.indices.map(i => s"bk$i")
    val lk = blockKeys.map(_._1)
    val rk = blockKeys.map(_._2)
    def eq(al: String, cols: Seq[String], bl: String, cols2: Seq[String]) =
      cols.zip(cols2).map { case (a, b) => s"$al.$a = $bl.$b" }.mkString(" AND ")
    val cntL = lk.zip(bkAlias).map { case (c, a) => s"$c AS $a" }.mkString(", ")
    val onCntL = lk.zip(bkAlias).map { case (c, a) => s"l.$a = r.$a" }.mkString(" AND ")
    val plSel = payloadLeft.map(c => s"lf.$c").mkString(", ")
    val prSel = payloadRight.map(c => s"rt.$c").mkString(", ")
    val bkList = bkAlias.mkString(", ")
    s"""${p}cnt AS (SELECT l.${bkAlias.mkString(", l.")}, l.nl * r.nr AS np
       |  FROM (SELECT $cntL, COUNT(*) AS nl FROM $leftTable GROUP BY ${bkAlias.indices.map(_ + 1).mkString(", ")}) l
       |  JOIN (SELECT ${rk.zip(bkAlias).map { case (c, a) => s"$c AS $a" }.mkString(", ")}, COUNT(*) AS nr
       |        FROM $rightTable GROUP BY ${bkAlias.indices.map(_ + 1).mkString(", ")}) r
       |    ON $onCntL),
       |${p}pf AS (SELECT $plSel, $prSel
       |  FROM $leftTable lf JOIN $rightTable rt ON ${eq("lf", lk, "rt", rk)}
       |  JOIN ${p}cnt ON ${lk.zip(bkAlias).map { case (c, a) => s"lf.$c = ${p}cnt.$a" }.mkString(" AND ")}
       |  WHERE ${p}cnt.np <= $maxBlockPairs),
       |${p}hot AS (SELECT $bkList FROM ${p}cnt WHERE np > $maxBlockPairs),
       |${p}iv AS (SELECT ${lk.zip(bkAlias).map { case (c, a) => s"lf.$c AS $a" }.mkString(", ")},
       |    $sortKeyLeft AS sk, 0 AS side, lf.$idLeft AS ida,
       |    CAST(NULL AS BIGINT) AS idb
       |  FROM $leftTable lf JOIN ${p}hot ON ${lk.zip(bkAlias).map { case (c, a) => s"lf.$c = ${p}hot.$a" }.mkString(" AND ")}
       |  UNION ALL
       |  SELECT ${rk.zip(bkAlias).map { case (c, a) => s"rt.$c" }.mkString(", ")},
       |    $sortKeyRight, 1, CAST(NULL AS BIGINT), rt.$idRight
       |  FROM $rightTable rt JOIN ${p}hot ON ${rk.zip(bkAlias).map { case (c, a) => s"rt.$c = ${p}hot.$a" }.mkString(" AND ")}),
       |${p}rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY $bkList
       |    ORDER BY sk, side) AS rk FROM ${p}iv),
       |${p}pw0 AS (SELECT CASE WHEN x.side = 0 THEN x.ida ELSE y.ida END AS ida,
       |    CASE WHEN x.side = 1 THEN x.idb ELSE y.idb END AS idb
       |  FROM ${p}rk x JOIN ${p}rk y
       |    ON ${bkAlias.map(a => s"x.$a = y.$a").mkString(" AND ")}
       |    AND y.rk > x.rk AND y.rk <= x.rk + $window AND x.side <> y.side),
       |${p}pw AS (SELECT ${payloadLeft.map(c => s"lf.$c").mkString(", ")}, ${payloadRight.map(c => s"rt.$c").mkString(", ")}
       |  FROM ${p}pw0 JOIN $leftTable lf ON lf.$idLeft = ${p}pw0.ida
       |  JOIN $rightTable rt ON rt.$idRight = ${p}pw0.idb),
       |${p}cand AS (SELECT * FROM ${p}pf UNION ALL SELECT * FROM ${p}pw)""".stripMargin
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
