package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles WITHOUT unbounded aggregate state — the
  * scale-safe replacement for Spark's `percentile` TypedImperativeAggregate, which
  * buffers a value→count map of every distinct value per group and merges
  * it on ONE task per group (an OOM at 100 TB; the r10 q11 finding).
  *
  * Sort-based two-pass shape instead:
  *   1. collapse to distinct (group, value) multiplicities — ONE hash
  *      exchange with map-side combining (duplicates never travel);
  *   2. running count per group via a streaming window frame (sort-based,
  *      spill-backed: rows stream through in order, nothing buffers);
  *   3. each requested quantile's two bracketing order statistics are
  *      picked by a conditional aggregation over the rank intervals
  *      (cum−c, cum], then linearly interpolated — `quantile_cont`
  *      semantics, identical to Spark's `percentile` up to final-ulp
  *      formula association (spec-pinned at 1e-9).
  *
  * NULL values are excluded, matching the aggregate's semantics; groups
  * whose values are all NULL are absent from the output (the aggregate
  * would emit NULL — callers needing those rows outer-join this frame).
  *
  * Output: (groupCol, n, <one double column per qs key>), unrounded.
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Map[String, Double]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    require(qs.values.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    require(!qs.contains("n") && qs.keys.forall(_ != groupCol),
      "quantile names must not collide with the n/group output columns")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val ns = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("g").orderBy("v")))
    // 1-indexed interpolation position pos = 1 + (n−1)q; the row whose
    // covered rank interval (cum−c, cum] contains k is the k-th order stat
    def pos(q: Double) = lit(1.0) + (col("n") - 1).cast("double") * q
    def kLo(q: Double) = floor(pos(q)).cast("long")
    def kHi(q: Double) = least(kLo(q) + 1, col("n"))
    def at(k: Column) =
      max(when(col("cum") - col("c") < k && k <= col("cum"), col("v")))
    val sorted = qs.toSeq.sortBy(_._1)
    val aggs = first(col("n")).as("n") +: sorted.flatMap { case (name, q) =>
      Seq(at(kLo(q)).as(s"__lo_$name"), at(kHi(q)).as(s"__hi_$name"))
    }
    val picks = cum.join(broadcast(ns), "g")
      .groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
    val out = sorted.foldLeft(picks) { case (acc, (name, q)) =>
      val frac = pos(q) - floor(pos(q))
      acc.withColumn(name,
        col(s"__lo_$name") + (col(s"__hi_$name") - col(s"__lo_$name")) * frac)
    }
    out.select(col("g").as(groupCol) +: col("n") +:
      sorted.map { case (name, _) => col(name) }: _*)
  }
}
