package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-layout operations over a table's FILE MANIFEST — the
  * operational tier of the landing family ([[graft.sources.ParquetSink]]
  * writes layouts; these operators audit and maintain them at fleet
  * scale). Every input here is a manifest frame (one row per file:
  * id, bytes, per-column min/max), which is MODEL-sized by nature
  * (10⁴–10⁵ rows for a 100 TB table at healthy file sizes) — so joins
  * and prefix passes over it are cheap regardless of data volume, and
  * everything replays in SQL (q158).
  */
object Layout {

  /** Small-file compaction plan — next-fit-decreasing bin packing, the
    * OPTIMIZE/compaction planner shape: files order by (bytes desc, id),
    * an EXCLUSIVE prefix sum of bytes assigns contiguous groups of
    * ~`targetBytes` each (grp = offset div target). The classic
    * next-fit-decreasing bound holds: every group's total stays under
    * targetBytes + its own largest file (spec-asserted), and a file
    * larger than the target lands alone (nothing splits — file rewrite
    * granularity). The prefix sum is [[Packing.withGlobalOffset]]'s
    * two-pass form (no single-task global window even if a manifest
    * grows pathological). Output: (file, bytes, grp). */
  def compactionPlan(
      files: DataFrame,
      fileCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val prep = files
      .select(col(fileCol).as("file"), col(bytesCol).cast("long").as("bytes"))
      .withColumn("__nb", negate(col("bytes")))
    Packing.withGlobalOffset(prep, Seq("__nb", "file"), "bytes", "__off")
      .select(col("file"), col("bytes"),
        ZOrder.intDiv(col("__off"), lit(targetBytes)).as("grp"))
  }

  /** Clustering health of a layout on one column — the re-OPTIMIZE
    * decision probe: how disjoint are the per-file [lo, hi] ranges?
    * A fresh [[graft.sources.ParquetSink.writeRangeLayout]] scores 0
    * overlapping pairs; appends/late data erode that until range scans
    * stop skipping. One model-sized interval self-join; output one row:
    * (n_files, overlap_pairs, overlap_ratio ∈ [0,1] of all pairs,
    * well_clustered = no overlaps). Single-file layouts are trivially
    * clustered (ratio 0). */
  def clusteringHealth(
      ranges: DataFrame,
      fileCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val r = ranges.select(col(fileCol).as("f"),
      col(loCol).cast("long").as("lo"), col(hiCol).cast("long").as("hi"))
    val pairs = r.as("a")
      .join(r.select(col("f").as("f2"), col("lo").as("lo2"), col("hi").as("hi2")),
        col("f") < col("f2") && col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .agg(count(lit(1)).as("overlap_pairs"))
    r.agg(count(lit(1)).as("n_files"))
      .crossJoin(pairs)
      .select(col("n_files"), col("overlap_pairs"),
        when(col("n_files") > 1,
          round(col("overlap_pairs") * 2.0 /
            (col("n_files") * (col("n_files") - 1)), 6))
          .otherwise(lit(0.0)).as("overlap_ratio"),
        (col("overlap_pairs") === 0).as("well_clustered"))
  }
}
