package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Spectral readouts over embedding columns (SURVEY.md §2.10 L154): the
  * top principal direction of an embedding corpus via an exact-integer
  * scatter matrix + deterministic power iteration — the
  * variance-structure audit run before committing to a projection
  * ([[Similarity.randomProjection]] preserves geometry blindly; THIS
  * measures where the variance actually lives), and the whitening/
  * anisotropy diagnostic for ANN recall (a corpus whose top component
  * dominates routes badly under cosine IVF).
  *
  * Determinism discipline (the q90/L30 quantized-space rule pushed to
  * linear algebra): components quantize to integers vq = round(x·10^q);
  * the CENTERED scatter matrix is computed exactly in integers via
  * C = n·Σᵢ vqᵢvqᵢᵀ − S·Sᵀ (S = column sums) — no float mean, no
  * subtraction-order sensitivity; power iteration normalizes by the
  * max-abs component (L∞ — never an L2 norm, whose sqrt would land on
  * libm) and re-quantizes each round with the q205 micro-quantization
  * convention floor(x·10^q + 0.5), so every iterate is an exact integer
  * vector any engine reproduces. The ONLY doubles are the per-round
  * ratio w/m (one correctly-rounded division of exact operands) and the
  * final dominance readout.
  *
  * λ̂ rides the iteration itself: with v normalized to max-abs 10^q,
  * w = C·v ≈ λ₁·v at convergence, so m = max|w| ≈ λ₁·10^q — the
  * eigenvalue estimate needs NO extra matrix products. The emitted
  * `dominance` = m / (10^q · trace C) ∈ [0, 1] is the explained-variance
  * share of the top component (trace C = Σ eigenvalues, both in the same
  * scaled units, so the units cancel).
  *
  * Scale shape: three narrow corpus passes (count; per-dimension sums;
  * the Gram pairs — a dim²-per-row projection collapsing MAP-SIDE into
  * one dim²-row frame, the only pass that costs n·dim² CPU and the
  * standard distributed-PCA shape); everything after runs on dim/dim²
  * MODEL frames collected to the driver (the kMeansCentroids model-state
  * contract: dim² ≤ 4096 rows at dim 64, never corpus rows). Exactness
  * bound: C entries ≤ n²·10^(2q)·max(x)² must fit DECIMAL(38)/HUGEINT —
  * at q = 6 and unit-ish components that is n ≲ 10⁷; larger corpora
  * lower `quantDecimals` (the documented trade, same class as L30). */
object Spectral {

  private val DEC = DecimalType(38, 0)

  /** Top principal component by `iters` rounds of exact power iteration.
    *
    * Output: one row per dimension, total-ordered —
    * (pos, component, n, iters, dominance); `component` is the iterate
    * at 10^q scale (max-abs component = ±10^q by construction),
    * `dominance` the explained-variance share of the top component,
    * rounded to `roundTo`.
    *
    * Degenerate corpora fail LOUD (the kCenterSelect rule): an empty /
    * all-identical corpus has a zero scatter matrix — no principal
    * direction exists, and a fabricated one would poison any downstream
    * whitening decision. Mixed vector lengths fail loud too. */
  def pcaTopComponent(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      iters: Int = 6,
      quantDecimals: Int = 6,
      roundTo: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters $iters outside [1,64]")
    require(quantDecimals >= 1 && quantDecimals <= 9,
      s"quantDecimals $quantDecimals outside [1,9]")
    val scale = math.pow(10.0, quantDecimals)
    val spark = df.sparkSession
    val staged = df
      .where(col(idCol).isNotNull && col(vecCol).isNotNull &&
        !exists(col(vecCol), x => isnan(x.cast("double"))))
      .select(
        transform(col(vecCol),
          x => round(x.cast("double") * scale).cast(LongType)).as("vq"))
    val dims = staged.agg(
      count(lit(1)).as("n"),
      min(size(col("vq"))).as("dmin"),
      max(size(col("vq"))).as("dmax"),
      max(array_max(transform(col("vq"), x => abs(x)))).as("vmax"))
      .collect().head
    val n = dims.getLong(0)
    require(n > 0, "Spectral.pcaTopComponent: empty corpus after the " +
      "NULL/NaN drop — no principal direction exists")
    val dim = dims.getInt(1)
    require(dim == dims.getInt(2) && dim >= 1,
      s"Spectral.pcaTopComponent: mixed vector lengths " +
        s"(${dims.getInt(1)} vs ${dims.getInt(2)}) — fix the corpus, " +
        "a padded/truncated scatter matrix would be silently wrong")
    // the Gram pass multiplies quantized components in int64 BEFORE the
    // decimal cast — a component beyond ~3·10⁹ quantized units would
    // WRAP silently (never a wrong-but-plausible scatter matrix): fail
    // loud and tell the caller to lower quantDecimals
    val vmax = dims.getLong(3)
    require(vmax <= 3000000000L,
      s"Spectral.pcaTopComponent: quantized component magnitude $vmax " +
        s"exceeds the int64-exact product bound (3e9) — lower " +
        s"quantDecimals (currently $quantDecimals) for this value range")
    // pass 2 (fused, r19 optimization round): per-dimension sums AND the
    // Gram pairs in ONE corpus scan — the sums ride the same explode as
    // (a, b = −1, pr = xa) sentinel structs next to the UPPER-TRIANGLE
    // product structs (the scatter matrix is symmetric, so a ≤ b pairs
    // carry all the information and the explode volume halves:
    // dim·(dim+1)/2 + dim structs per row), all collapsed map-side into
    // one exact decimal aggregation; the driver mirrors. Previously the
    // sums were their own posexplode pass — same exact decimal sums of
    // the same values, one fewer full corpus scan + shuffle.
    val sArr = Array.fill(dim)(BigInt(0))
    val pArr = Array.fill(dim, dim)(BigInt(0))
    staged
      .select(explode(flatten(transform(col("vq"), (xa, a) =>
        concat(
          array(struct(a.as("a"), lit(-1).as("b"), xa.as("pr"))),
          transform(slice(col("vq"), a + 1, lit(dim) - a), (xb, b) =>
            struct(a.as("a"), (a + b).as("b"), (xa * xb).as("pr"))))))).as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"))
      .agg(sum(col("t.pr").cast(DEC)).as("pab"))
      .collect().foreach { r =>
        val (a, b) = (r.getInt(0), r.getInt(1))
        val v = BigInt(r.getDecimal(2).toBigInteger)
        if (b == -1) sArr(a) = v
        else { pArr(a)(b) = v; pArr(b)(a) = v }
      }
    // driver-side exact model math (dim² integers — model state)
    val bigN = BigInt(n)
    val c = Array.tabulate(dim, dim)((a, b) => bigN * pArr(a)(b) - sArr(a) * sArr(b))
    val trace = (0 until dim).map(d => c(d)(d)).sum
    require(trace > 0, "Spectral.pcaTopComponent: zero scatter matrix " +
      "(all vectors identical) — no principal direction exists")
    val d0 = (0 until dim).maxBy(d => (c(d)(d), -d))
    val scaleL = BigInt(scale.toLong)
    var v = Array.tabulate(dim)(d => if (d == d0) scaleL else BigInt(0))
    var m = BigInt(0)
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(dim)(a =>
        (0 until dim).map(b => c(a)(b) * v(b)).sum)
      m = w.map(_.abs).max
      require(m > 0, "Spectral.pcaTopComponent: power iterate collapsed " +
        "to zero — the start vector lies in the scatter matrix kernel")
      // the q205 micro-quantization convention, ONE correctly-rounded
      // double division of exact operands per component
      v = w.map(wa =>
        BigInt(math.floor(wa.toDouble / m.toDouble * scale + 0.5).toLong))
    }
    val dominance = BigDecimal(m.toDouble / (scale * trace.toDouble))
      .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    (0 until dim).map(d =>
        (d.toLong, v(d).toLong, n, iters.toLong, dominance))
      .toDF("pos", "component", "n", "iters", "dominance")
      .orderBy("pos")
  }

  /** GENERATES the DuckDB replay of [[pcaTopComponent]] from the same
    * loop structure (the kCenterSqlCtes/lpaSqlCtes one-source-of-truth
    * rule): staging + exact scatter CTEs, then one (w, m, v) CTE block
    * per power-iteration round, then the dominance readout — a FULL
    * hash oracle for an iterative numerical-linear-algebra operator,
    * not a rows-only waiver. */
  def pcaSqlCtes(
      table: String,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      iters: Int = 6,
      quantDecimals: Int = 6,
      roundTo: Int = 6): String = {
    require(iters >= 1 && iters <= 64, s"iters $iters outside [1,64]")
    val scale = "1" + ("0" * quantDecimals)
    val rounds = (1 to iters).map { t =>
      s"""w$t AS MATERIALIZED (SELECT c.pa AS pos, SUM(c.cv * v$t.val) AS w
         |  FROM c JOIN v$t ON v$t.pos = c.pb GROUP BY 1),
         |m$t AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w$t),
         |v${t + 1} AS MATERIALIZED (SELECT pos,
         |    CAST(FLOOR(CAST(w AS DOUBLE) / (SELECT CAST(m AS DOUBLE) FROM m$t)
         |      * $scale + 0.5) AS BIGINT) AS val
         |  FROM w$t)""".stripMargin
    }
    s"""WITH v0 AS (SELECT $idCol AS vid, CAST($vecCol AS DOUBLE[]) AS e
       |    FROM $table
       |    WHERE $idCol IS NOT NULL AND $vecCol IS NOT NULL
       |      AND len(list_filter(CAST($vecCol AS DOUBLE[]),
       |                          x -> isnan(x))) = 0),
       |  ex AS MATERIALIZED (SELECT vid, i - 1 AS pos,
       |      CAST(ROUND(e[i] * $scale) AS BIGINT) AS vq
       |    FROM (SELECT vid, e,
       |      unnest(generate_series(1, len(e))) AS i FROM v0)),
       |  cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS nv FROM v0),
       |  s AS MATERIALIZED (SELECT pos, CAST(SUM(CAST(vq AS HUGEINT)) AS HUGEINT) AS sd
       |    FROM ex GROUP BY 1),
       |  p AS MATERIALIZED (SELECT a.pos AS pa, b.pos AS pb,
       |      CAST(SUM(CAST(a.vq AS HUGEINT) * b.vq) AS HUGEINT) AS pab
       |    FROM ex a JOIN ex b USING (vid) GROUP BY 1, 2),
       |  c AS MATERIALIZED (SELECT pa, pb,
       |      (SELECT nv FROM cnt) * pab - sa.sd * sb.sd AS cv
       |    FROM p JOIN s sa ON sa.pos = p.pa JOIN s sb ON sb.pos = p.pb),
       |  tr AS MATERIALIZED (SELECT SUM(cv) AS trace FROM c WHERE pa = pb),
       |  d0 AS (SELECT pa AS d FROM c WHERE pa = pb ORDER BY cv DESC, pa
       |    LIMIT 1),
       |  v1 AS MATERIALIZED (SELECT pa AS pos,
       |      CASE WHEN pa = (SELECT d FROM d0)
       |        THEN CAST($scale AS BIGINT) ELSE CAST(0 AS BIGINT) END AS val
       |    FROM c WHERE pa = pb),
       |  ${rounds.mkString(",\n")}
       |SELECT pos, val AS component,
       |  (SELECT CAST(nv AS BIGINT) FROM cnt) AS n,
       |  CAST($iters AS BIGINT) AS iters,
       |  ROUND((SELECT CAST(m AS DOUBLE) FROM m$iters)
       |    / ($scale * (SELECT CAST(trace AS DOUBLE) FROM tr)), $roundTo)
       |    AS dominance
       |FROM v${iters + 1} ORDER BY pos""".stripMargin
  }
}
