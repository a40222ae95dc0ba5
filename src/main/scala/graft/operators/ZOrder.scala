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
}
