package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimension clustering — the lakehouse layout for
  * scans that filter on SEVERAL columns at once (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`): [[graft.sources.ParquetSink.writeRangeLayout]] makes one
  * column's ranges disjoint per file, but a second filter column then
  * scatters across every file. Interleaving the bits of each dimension's
  * bucket number yields a single sort key whose contiguous chunks are
  * (approximate) hyper-rectangles — every file gets a TIGHT min/max on
  * EVERY z-dimension, so row-group/file skipping works for predicates on
  * any of them (at the price of per-dimension ranges no longer being
  * perfectly disjoint — the standard z-order trade).
  *
  * Everything here is exact int64 arithmetic — bucketing is integer
  * division, interleaving is shifts and masks — so the whole layout key
  * replays bit-identically in any engine (q151) and never depends on
  * float rounding. Doubles must be quantized to integers by the caller
  * first (the [[Similarity.labelCentroidCos]] quantization discipline).
  *
  * Scale shape: bounds are one cheap min/max aggregation (2·d longs of
  * driver model state); the z-code is a narrow per-row projection; the
  * layout write is one sampled range exchange on the code. Skewed
  * dimensions concentrate buckets exactly as they concentrate values —
  * probe with [[Skew.keySkewProfile]] first, as with every layout choice.
  */
object ZOrder {

  /** Morton-interleave pre-bucketed dimension columns (each already in
    * [0, 2^bits)); dimension j contributes bit i to output bit
    * i·d + j, so dims.head owns the LEAST-significant interleaved bit.
    * d·bits must fit an int64: require d·bits ≤ 62. */
  def mortonCode(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "mortonCode: need at least one dimension")
    require(bits >= 1 && dims.size * bits <= 62,
      s"mortonCode: ${dims.size} dims x $bits bits exceeds int64")
    val d = dims.size
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket of an integral column into [0, 2^bits) over the
    * CLOSED range [minV, maxV] — exact integer arithmetic:
    * ((v − min) · 2^bits) div (range + 1). REQUIRES
    * (maxV − minV + 1) · 2^bits ≤ 2^63 − 1, enforced below: an oversized
    * range would wrap the non-ANSI multiplication negative and silently
    * produce garbage buckets (at the [[graft.operators.ZOrder]] default
    * bits=16 an epoch-MICROS span already wraps past ~4.5 years — use
    * epoch-seconds/millis or fewer bits for wide time ranges). */
  /** int64 `div`, never `/`: Spark's Column division widens longs to
    * DOUBLE, and a quotient within an ulp of an integer would land a
    * boundary value differently from an oracle's exact `//`. Shared by
    * every exact-integer-arithmetic operator and query in the engine. */
  def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
  }

  /** FLOOR int64 division — [[intDiv]] truncates toward zero, which
    * disagrees with SQL `//` (floor) for negative operands: a pre-epoch
    * timestamp would land in a double-width slot 0 under truncation.
    * (x − pmod(x, b)) / b is exact floor division for b > 0 (pmod is
    * always non-negative, and the adjusted numerator is an exact
    * multiple of b). */
  def floorDiv(a: Column, b: Column): Column =
    intDiv(a - pmod(a, b), b)

  def intBucket(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"intBucket: empty range [$minV, $maxV]")
    require(bits >= 1 && bits <= 31, s"intBucket: bits $bits outside [1,31]")
    // BigInt: maxV − minV itself can wrap for near-full-int64 ranges
    val span = BigInt(maxV) - BigInt(minV) + 1
    require(span <= (BigInt(Long.MaxValue) >> bits),
      s"intBucket: range [$minV, $maxV] x 2^$bits overflows int64 " +
        s"(span $span > ${Long.MaxValue >> bits}); coarsen the units " +
        "(e.g. epoch-seconds, not micros) or lower bits")
    intDiv((c.cast("long") - lit(minV)) * lit(1L << bits), lit(maxV - minV + 1L))
  }

  /** Append column `outCol` = morton code over `cols` (integral columns),
    * bucketing each over its own observed global [min, max]. One min/max
    * aggregation (2·|cols| longs to the driver — model state), then a
    * narrow projection; rows where any dimension is null get a null code
    * (sort them wherever the layout policy puts nulls). */
  def zCode(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      outCol: String = "z"): DataFrame = {
    require(cols.nonEmpty, "zCode: need at least one column")
    val bounds = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c"))).tail: _*).head()
    val dims = cols.zipWithIndex.map { case (c, i) =>
      require(!bounds.isNullAt(2 * i),
        s"zCode: column $c has no non-null values")
      intBucket(col(c), bounds.getLong(2 * i), bounds.getLong(2 * i + 1), bits)
    }
    df.withColumn(outCol, mortonCode(dims, bits))
  }

  /** 2-D Hilbert index over pre-bucketed coordinates (each in
    * [0, 2^bits)) — [[mortonCode]]'s stronger sibling: the Hilbert curve
    * moves exactly ONE cell per step (Manhattan distance 1, spec-
    * verified on the full grid), where the Z-curve takes long diagonal
    * jumps at every power-of-two boundary. Contiguous Hilbert chunks
    * are therefore tighter hyper-rectangles → tighter per-file min/max
    * on both dimensions → fewer files read for the same box predicate
    * (q191 measures exactly that, hilbert vs morton on the same data).
    *
    * The classic bit-interleave-free formulation (Hamilton's xy2d):
    * `bits` rounds from the top bit down; each round reads the two
    * quadrant bits, adds `s²·((3·rx) xor ry)` to the index, and
    * reflects/transposes the frame. Implemented as one STAGED projection
    * per round (`withColumns` — simultaneous x/y update; each round's
    * coordinates are multi-reference attributes, the shape
    * CollapseProject keeps staged), so the expression tree is linear in
    * `bits`, not exponential. Exact int64 throughout: index < 4^bits ≤
    * 2^60, no float anywhere — the whole derivation replays in integer
    * SQL (the generated-CTE oracle of q191). NULL coordinates yield a
    * NULL index.
    *
    * Scale shape: a narrow per-row projection chain — zero shuffles;
    * pair with a range exchange on the index for the layout write,
    * exactly as [[zCode]]. */
  def hilbertCode2D(
      df: DataFrame,
      xb: Column,
      yb: Column,
      bits: Int,
      outCol: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 30,
      s"hilbertCode2D: bits $bits outside [1,30] (index must fit int64)")
    // explicit NULL gate: the per-round CASE arms default missing
    // quadrant bits to 0 (`otherwise` swallows a NULL predicate), so
    // without this flag a NULL coordinate would silently index to 0
    var cur = df
      .withColumns(Map(
        "__hx" -> xb.cast("long"), "__hy" -> yb.cast("long"),
        "__hnull" -> (xb.isNull || yb.isNull),
        "__hd" -> lit(0L)))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumns(Map(
          "__rx" -> when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L),
          "__ry" -> when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)))
        .withColumns(Map(
          "__hd" -> (col("__hd") + lit(s * s) *
            (lit(3L) * col("__rx")).bitwiseXOR(col("__ry"))),
          "__nx" -> when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")),
          "__ny" -> when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy"))))
        .drop("__hx", "__hy", "__rx", "__ry")
        .withColumnRenamed("__nx", "__hx")
        .withColumnRenamed("__ny", "__hy")
    }
    cur.withColumn(outCol,
        when(!col("__hnull"), col("__hd")))
      .drop("__hx", "__hy", "__hd", "__hnull")
  }

  /** The DuckDB replica of [[hilbertCode2D]] as a generated CTE chain —
    * ONE source of truth for the per-round arithmetic on both engines
    * (the oracle string is generated from the same loop, so the two
    * implementations cannot drift silently). `from` must expose integer
    * columns `hx`, `hy` (pre-bucketed) plus any carry-through columns
    * named in `carry`; the final CTE is `hil` with column `h`. */
  def hilbertSqlCtes(from: String, bits: Int, carry: Seq[String]): String = {
    require(bits >= 1 && bits <= 30, s"hilbertSqlCtes: bits $bits")
    val keep = carry.mkString(", ")
    val rounds = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val src = if (k == 0) from else s"h$k"
      s"""h${k + 1} AS (SELECT $keep,
         |  hd + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |    (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END
         |  ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END
         |  ELSE hy END AS hy
         |FROM $src)""".stripMargin
    }
    val seed = s"h0 AS (SELECT $keep, hx, hy, CAST(0 AS BIGINT) AS hd FROM $from)"
    val chain = rounds.zipWithIndex.map { case (cte, k) =>
      if (k == 0) cte.replace(s"FROM $from)", "FROM h0)") else cte
    }
    (seed +: chain).mkString(",\n") +
      s",\nhil AS (SELECT $keep, hd AS h FROM h$bits)"
  }
}
