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
    * stop skipping. Output one row: (n_files, overlap_pairs,
    * overlap_ratio ∈ [0,1] of all pairs, well_clustered = no overlaps).
    * Single-file layouts are trivially clustered (ratio 0).
    *
    * SWEEP-LINE, not a pairwise join: the manifest of a 100 TB table at
    * 128 MB/file is ~800k rows, where an interval theta self-join
    * (nested-loop) is ~3·10¹¹ pair probes — the pairwise form's own
    * input breaks its plan. Instead, count the COMPLEMENT: a pair of
    * valid intervals (lo ≤ hi) is disjoint iff one ends strictly before
    * the other starts, so
    *   disjoint_pairs = Σ_b |{a : hi_a < lo_b}|
    * (each disjoint pair counted exactly once, earlier-ending side as
    * `a`). That rank-against-the-other-endpoint sum is one event sweep:
    * union lo-events and hi-events, order by (value, lo-before-hi at
    * ties — a tie hi == lo touches, so must NOT count as earlier), and
    * take an exclusive global prefix sum of the hi-event indicator
    * ([[Packing.withGlobalOffset]]'s two-pass form — one range exchange,
    * no single-task stage). overlap_pairs = C(n,2) − disjoint_pairs.
    * O(n log n), distributed; property-tested equal to the pairwise
    * join on randomized manifests (LayoutSpec).
    *
    * Rows with NULL bounds contribute no pairs (the pairwise join's
    * NULL-predicate semantics) but still count in n_files; rows with
    * lo > hi are rejected (corrupt manifest — fail loud, not garbage). */
  def clusteringHealth(
      ranges: DataFrame,
      fileCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val r = ranges.select(col(fileCol).as("f"),
      col(loCol).cast("long").as("lo"), col(hiCol).cast("long").as("hi"))
    val valid = r.where(col("lo").isNotNull && col("hi").isNotNull)
    // corrupt-manifest guard: an inverted interval would silently skew
    // the complement count — surface it instead
    val checked = valid.select(col("lo"),
      when(col("lo") <= col("hi"), col("hi"))
        .otherwise(raise_error(concat(lit("clusteringHealth: lo > hi for file "),
          col("f").cast("string")))).as("hi"))
    val ev = checked.select(col("lo").as("v"), lit(0).as("t"), lit(0L).as("isHi"))
      .unionAll(checked.select(col("hi").as("v"), lit(1).as("t"), lit(1L).as("isHi")))
    val disjoint = Packing.withGlobalOffset(ev, Seq("v", "t"), "isHi", "__hiBefore")
      .where(col("t") === 0)
      .agg(coalesce(sum(col("__hiBefore")), lit(0L)).as("disjoint_pairs"))
    r.agg(count(lit(1)).as("n_files"),
        count(when(col("lo").isNotNull && col("hi").isNotNull, 1)).as("__nv"))
      .crossJoin(disjoint)
      .select(col("n_files"),
        (ZOrder.intDiv(col("__nv") * (col("__nv") - 1), lit(2L)) -
          col("disjoint_pairs")).as("overlap_pairs"))
      .select(col("n_files"), col("overlap_pairs"),
        when(col("n_files") > 1,
          round(col("overlap_pairs") * 2.0 /
            (col("n_files") * (col("n_files") - 1)), 6))
          .otherwise(lit(0.0)).as("overlap_ratio"),
        (col("overlap_pairs") === 0).as("well_clustered"))
  }

  /** Zone-map pruning estimate — the data-skipping effectiveness audit
    * that closes the layout loop: [[clusteringHealth]] says whether a
    * layout has DECAYED; this says what that costs, per representative
    * query range, BEFORE running anything against the data. For each
    * query `[qlo, qhi]`, a file must be read iff its zone `[lo, hi]`
    * intersects the range (`lo ≤ qhi AND hi ≥ qlo`); files with NULL
    * zone bounds are UNPRUNABLE and always read (exactly how an engine
    * treats a missing statistic — the estimate must not be more
    * optimistic than the scanner). Output per query: file/byte totals,
    * files/bytes read, and the file/byte skip ratios a healthy layout
    * should keep high.
    *
    * Scale shape: manifest × query-set cross join with the QUERY side
    * broadcast — the manifest is model-sized by this module's contract
    * and the representative query set is smaller still, so the product
    * is bounded and never touches the data; one aggregation with
    * map-side combining on the query key. */
  def pruningEstimate(
      ranges: DataFrame,
      queries: DataFrame,
      fileCol: String,
      bytesCol: String,
      loCol: String,
      hiCol: String,
      qidCol: String = "qid",
      qloCol: String = "qlo",
      qhiCol: String = "qhi",
      roundTo: Int = 6): DataFrame = {
    val m = ranges.select(col(fileCol).as("f"),
      col(bytesCol).cast("long").as("b"),
      col(loCol).cast("long").as("lo"), col(hiCol).cast("long").as("hi"))
    val q = broadcast(queries.select(col(qidCol).as("qid"),
      col(qloCol).cast("long").as("qlo"),
      col(qhiCol).cast("long").as("qhi")))
    val read =
      coalesce(col("lo") <= col("qhi") && col("hi") >= col("qlo"), lit(true))
    m.crossJoin(q)
      .groupBy("qid", "qlo", "qhi")
      .agg(count(lit(1)).as("files_total"),
        sum(col("b")).as("bytes_total"),
        count(when(read, 1)).as("files_read"),
        coalesce(sum(when(read, col("b"))), lit(0L)).as("bytes_read"))
      .select(col("qid"), col("qlo"), col("qhi"),
        col("files_total"), col("files_read"),
        col("bytes_total"), col("bytes_read"),
        round(lit(1.0) - col("files_read") * lit(1.0) / col("files_total"),
          roundTo).as("file_skip_ratio"),
        round(lit(1.0) - col("bytes_read") * lit(1.0) / col("bytes_total"),
          roundTo).as("byte_skip_ratio"))
      .orderBy("qid")
  }
}
