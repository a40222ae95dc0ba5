package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** One declared engine capability, expressed as a Spark DataFrame builder plus
  * (where ANSI-SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. The driver hash-compares the two on sf0.01 (SURVEY.md §2.12).
  *
  * Determinism contract (FIXTURES.md "Oracle-determinism rules"): every query
  * ends in a total ORDER BY over unique keys; floating aggregates go through
  * [[H.msum]]/[[H.davg]] (exact decimal accumulation, so partition/association
  * order cannot perturb the result) and are rounded; collections are emitted as
  * explicitly sorted strings; computed integers are cast to BIGINT on both
  * sides.
  */
final case class QueryDef(
    name: String,
    doc: String,
    builder: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def queries: Seq[QueryDef]
}

/** Shared helpers keeping Spark-vs-DuckDB results bit-identical. */
object H {
  import graft.core.Tables

  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables.load(s, dir, name)

  private val DEC = DecimalType(30, 6)

  /** Exact decimal cast for money-ish doubles: makes sums order-insensitive.
    * Also the safe way to emit derived row-level money values: recovering the
    * exact ≤4-decimal value and casting back to double avoids ROUND(double)
    * whose half-way tie rule differs between Spark (HALF_UP on the exact
    * binary expansion) and DuckDB — exact products of 2-decimal inputs land
    * on those ties often. Rounding is only safe on continuous quantities
    * (quotients, stddev, cosine…), never on exact k-decimal values.
    */
  def dec(c: Column): Column = c.cast(DEC)

  /** Exact 4-decimal row value as double (see [[dec]]). */
  def dec4(c: Column): Column = dec(c).cast(DoubleType)

  /** Deterministic SUM over doubles: exact decimal accumulation, emitted
    * unrounded (the sum is an exact multiple of 1e-4; both engines cast the
    * identical exact decimal to the identical nearest double). */
  def msum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic AVG: exact decimal sum / non-null count, rounded. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(dec(c)).cast(DoubleType) / count(c), scale)

  /** Second-granularity render of a (NTZ) timestamp — stable across engines. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Micros since epoch of an NTZ timestamp (session tz = UTC ⇒ identity). */
  def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** NTZ timestamp literal (comparisons against TIMESTAMP_NTZ columns). */
  def ntz(s: String): Column = lit(s).cast("timestamp_ntz")

  // ---- DuckDB-side fragments mirroring the above ----
  def oDec4(x: String): String = s"CAST(CAST($x AS DECIMAL(30,6)) AS DOUBLE)"
  def oMsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE)"
  def oDavg(x: String, scale: Int = 4): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE) / COUNT($x), $scale)"
  def oTsStr(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
  def oUs(x: String): String = s"epoch_us($x)"

  /** DuckDB replica of [[graft.operators.Sampling.avalanche]]'s inner
    * 31-polynomial char fold over `CAST(x AS VARCHAR) || salt` — name the
    * result (conventionally `hp`) and feed it to [[oAvalanche]]. Added
    * late in round 11: oracles written before it inline the same idiom
    * verbatim (hash-verified); new oracles should use these. */
  def oPolyFold(x: String, salt: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(CAST($x AS VARCHAR) || '$salt', ''), " +
      s"c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, v) -> (a * 31 + v) % 1000000007)"

  /** The avalanche mix over a [[oPolyFold]] value — the full portable
    * hash in [0, 1e9+7); `% 10000` on top is [[graft.operators.Sampling.bucket]]. */
  def oAvalanche(hp: String): String =
    s"(($hp + 479001599) * ($hp + 987654323)) % 1000000007"
}
