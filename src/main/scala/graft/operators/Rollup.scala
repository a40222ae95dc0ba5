package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental rollup maintenance — the never-rescan-history contract every
  * 100 TB warehouse runs on: raw data is aggregated per time partition
  * into a mergeable partial-aggregate frame (model-sized: keys ×
  * partitions rows), and any later query over any partition range merges
  * partials instead of touching raw history. A new day costs scans of the
  * NEW DAY only — precisely, two column-pruned passes (the additive-stats
  * columns; the distinct-key column for the sketch), each with map-side
  * combining, deliberately NOT a persisted projection of the raw
  * partition (a corpus-sized operator-internal persist has no release
  * path — the [[Quality.unigramSurprisal]] rule: persist vocabulary-sized
  * frames, never the corpus-sized stream). Backfill, late data, and
  * compaction are all "replace that partition's partial and re-merge".
  *
  * Everything carried is mergeable by construction:
  *  - `n_rows` / `sum_v` — additive (sum in exact DECIMAL(30,6), so the
  *    merged sum is bit-identical to the direct sum regardless of how the
  *    data was partitioned — the [[graft.queries.H.msum]] rule);
  *  - `min_v` / `max_v` — idempotent lattice joins;
  *  - `kmv` — the bottom-k distinct-hash sketch of [[Sketches.kmvDistinct]]
  *    as a ≤ k-element sorted array. The merge identity is LOSSLESS: any
  *    hash in the global bottom-k is necessarily in its own partition's
  *    bottom-k, so re-selecting the k smallest over the union of per-
  *    partition sketches equals the bottom-k of the raw union — the merged
  *    estimate is definitionally [[Sketches.kmvDistinct]] over the whole
  *    range (spec-asserted, not approximately: exactly).
  *
  * AVG and stddev derive from (n_rows, sum_v) and an optional sum-of-
  * squares the caller can add the same way; genuinely non-mergeable
  * statistics (exact median) are out of contract — that is the point of
  * the sketch column.
  *
  * Scale shape: [[partialRollup]] is one grouped aggregation with map-side
  * combining plus the [[graft.plans.TopK]] heap (per-partition trim to k
  * hashes BEFORE the exchange) and a bounded ≤ k-element collect_list per
  * group; [[mergeRollup]] never sees raw rows — its input is partials, so
  * the merge cost is (partitions × keys), independent of corpus size.
  */
object Rollup {

  private val DEC = DecimalType(30, 6)

  /** Build the mergeable partial-aggregate frame for one or many time
    * partitions: (part, keyCols*, n_rows, sum_v, min_v, max_v, kmv).
    * `partCol` is the partition expression (e.g. `to_date(col("ts"))`);
    * `distinctCol` feeds the bottom-k distinct sketch (null keys carry no
    * distinct information and are excluded from the sketch, matching
    * COUNT(DISTINCT) semantics). */
  def partialRollup(
      df: DataFrame,
      partCol: Column,
      keyCols: Seq[String],
      valueCol: String,
      distinctCol: String,
      k: Int = 64,
      salt: String = ""): DataFrame = {
    require(k >= 2, s"k $k must be >= 2 (the estimator divides by k-1)")
    val keys = keyCols.map(col)
    val base = df.select(
      (partCol.as("part") +: keys) ++
        Seq(col(valueCol).as("v"), col(distinctCol).as("dk")): _*)
    val gcols = col("part") +: keys
    val stats = base.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast(DEC)).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
    val hx = base
      .select(gcols :+ Sampling.avalanche(col("dk"), salt).as("h"): _*)
      .where(col("h").isNotNull)
      .distinct()
    val kmv = graft.plans.TopK.perKey(hx, gcols, Seq(col("h").asc), k)
      .groupBy(gcols: _*)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
    stats.join(kmv, "part" +: keyCols, "left")
      .withColumn("kmv", coalesce(col("kmv"), array().cast("array<bigint>")))
  }

  /** Merge [[partialRollup]] frames (any union of partition ranges) into
    * final per-key statistics: (keyCols*, n_rows, sum_v, min_v, max_v,
    * n_seen, kth_hash, est_distinct). The input is partials — raw history
    * is never rescanned. `k` must match the build. */
  def mergeRollup(partials: DataFrame, keyCols: Seq[String], k: Int = 64): DataFrame = {
    require(k >= 2, s"k $k must be >= 2 (the estimator divides by k-1)")
    val keys = keyCols.map(col)
    val stats = partials.groupBy(keys: _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
    // a hash present in two partitions' sketches must count once: distinct
    // over the exploded union BEFORE re-selecting the bottom k
    val hx = partials
      .select(keys :+ explode_outer(col("kmv")).as("h"): _*)
      .where(col("h").isNotNull)
      .distinct()
    val km = graft.plans.TopK.perKey(hx, keys, Seq(col("h").asc), k)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_hash"))
    stats.join(km, keyCols, "left")
      .select(keys ++ Seq(
        col("n_rows"), col("sum_v"), col("min_v"), col("max_v"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        col("kth_hash"),
        Sketches.kmvEstimate(coalesce(col("n_seen"), lit(0L)), col("kth_hash"), k)
          .as("est_distinct")): _*)
  }
}
