package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group ordinary-least-squares trend fitting — the "is this metric
  * drifting" primitive behind ingest monitors and quality dashboards:
  * for each key, fit y = a + b·x over (x, y) observations and report
  * slope, intercept, and r² from SUFFICIENT STATISTICS — one grouped
  * aggregation, no iteration, no per-group state beyond six numbers.
  *
  * Determinism contract (the whole point vs a naive double `avg`):
  * the six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
  * in EXACT decimal — y quantized to integer units (the q90 discipline),
  * x centered per key to its min (exact long) so products fit
  * DECIMAL(19,0)×DECIMAL(19,0) → DECIMAL(38,0) in any engine — so the
  * sums are independent of partition/merge order. The scalar combination
  * afterward (slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept, r²) is a
  * FIXED-ORDER double expression over those exact sums: deterministic by
  * IEEE arithmetic alone, replayed verbatim in SQL (q156).
  *
  * Magnitude contract: |x−xmin| and |y·10^d| must satisfy
  * n·max|xc|·max|yq| < 10^19 (the DECIMAL(19,0) sum bound) — generous
  * for slot-indexed metrics (say n ≤ 10⁷ rows/key, xc ≤ 10⁴ slots,
  * yq ≤ 10⁷ units); pick `yQuantDecimals` to fit.
  *
  * Degenerate keys report NULL: slope/intercept/r² when all x equal,
  * r² additionally when all y equal (zero variance — r² undefined).
  *
  * Output: (keyCols*, n, x_min, slope, intercept, r2) — slope in value
  * units per x unit, intercept = fitted y at x = x_min, both rounded
  * to 6. */
object Trend {

  def olsTrend(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      yQuantDecimals: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keys = keyCols.map(col)
    val ys = math.pow(10.0, yQuantDecimals)
    val D = DecimalType(19, 0)
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys ++ Seq(col(xCol).cast("long").as("__x"),
        round(col(yCol) * ys).cast("long").as("__yq")): _*)
    val xmins = base.groupBy(keys: _*).agg(min(col("__x")).as("x_min"))
    val stats = base.join(xmins, keyCols)
      .withColumn("__xc", (col("__x") - col("x_min")).cast(D))
      .withColumn("__yd", col("__yq").cast(D))
      .groupBy(keys: _*)
      .agg(
        first(col("x_min")).as("x_min"),
        count(lit(1)).as("n"),
        sum(col("__xc")).as("sx"),
        sum(col("__yd")).as("sy"),
        sum(col("__xc") * col("__yd")).as("sxy"),
        sum(col("__xc") * col("__xc")).as("sxx"),
        sum(col("__yd") * col("__yd")).as("syy"))
    // fixed-order double combination over the exact decimal sums — every
    // term below must appear in the SAME order in the SQL replay
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slopeU = num / denx
    stats.select(keys ++ Seq(
      col("n"), col("x_min"),
      when(denx =!= 0.0, round(slopeU / ys, 6)).as("slope"),
      when(denx =!= 0.0, round((sy / n - slopeU * (sx / n)) / ys, 6)).as("intercept"),
      when(denx =!= 0.0 && deny =!= 0.0,
        round((num / denx) * (num / deny), 6)).as("r2")): _*)
  }
}
