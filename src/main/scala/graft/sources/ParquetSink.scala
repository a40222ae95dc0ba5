package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Parquet writers — the landing half of the pipeline (FileSources /
  * Tables are the reading half). Three shapes, each sized for a corpus:
  *
  *  - [[writePartitioned]]: hive-partitioned batch layout (the standard
  *    lake output: `path/lang=en/part-*.parquet`), with the two knobs
  *    that decide whether the layout survives scale — task routing and
  *    file sizing. Without routing, EVERY task holding rows of a
  *    partition value opens a file there: 32 tasks × 200 partition
  *    values = 6,400 files per write (the small-files problem, which
  *    punishes every later scan's split planning). Repartitioning on the
  *    partition columns first routes each value to one task — one file
  *    per value per `maxRecordsPerFile` window.
  *  - [[writeBucketed]]: bucketed+sorted table layout; downstream
  *    equi-joins and aggregations on the bucket columns skip their
  *    exchange entirely (plan-asserted in BucketedJoinSpec).
  *  - [[streamParquet]]: the streaming file sink — exactly-once via the
  *    sink's commit log, the durable landing for `readStream` pipelines.
  */
object ParquetSink {

  /** Hive-partitioned batch write.
    *
    * @param maxRecordsPerFile caps rows per file (0 = uncapped): with the
    *   one-task-per-value routing, a hot partition value would otherwise
    *   produce one giant file; the cap splits it into scan-parallel
    *   chunks without re-introducing the small-files problem.
    * @param sortCols optional within-file sort (e.g. a timestamp or id):
    *   buys parquet min/max-statistics pruning and better compression on
    *   the sorted columns for every future scan of this output.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L,
      sortCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val routed = df.repartition(partitionCols.map(col): _*)
    val laidOut =
      if (sortCols.isEmpty) routed
      else routed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    laidOut.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed (+ sorted) managed-table write: pre-shuffles once at write
    * time so every downstream equi-join/agg on `bucketCols` reads
    * co-located data and skips its exchange. Bucketing requires the table
    * catalog (`saveAsTable`) — a bare path cannot carry bucket metadata. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets > 0 && bucketCols.nonEmpty)
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    ws.saveAsTable(table)
  }

  /** Streaming parquet landing: append-mode file sink, exactly-once by
    * the sink's commit log (a restarted query never double-writes a
    * batch). Pass `Trigger.AvailableNow()` for a drain-and-stop backfill,
    * a ProcessingTime trigger for continuous landing. */
  def streamParquet[T](
      ds: Dataset[T],
      path: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      partitionCols: Seq[String] = Seq.empty): StreamingQuery = {
    val w = ds.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*)).start()
  }

  /** Range-clustered landing — the FILE-level complement of
    * [[writePartitioned]]'s directory pruning and [[writeBucketed]]'s
    * join co-location: `repartitionByRange` gives every output file a
    * NON-OVERLAPPING value range on `rangeCols` (sampled range exchange),
    * and the within-file sort tightens parquet row-group min/max stats.
    * A later range/point filter on those columns then skips row groups
    * inside Spark's parquet reader, and skips whole FILES in any
    * footer-/manifest-aware reader (Delta/Iceberg-class table formats
    * prune on exactly these per-file stats — plain Spark-on-path plans
    * all files and prunes at the row-group tier). The layout for
    * time-series and id-range scan patterns ("yesterday's events",
    * "ids 5M..6M") where a hash layout would scatter every query across
    * ALL files. `nFiles` sizes the range exchange — at 100 TB pick
    * bytes/file ≈ 256 MB–1 GB like [[writePartitioned]]'s cap.
    *
    * Skew note: range partitioning samples the distribution, so a hot
    * VALUE still lands in one partition — run
    * [[graft.operators.Skew.keySkewProfile]] first if the layout column
    * could concentrate; a skewed layout column wants [[writeBucketed]]
    * instead. ParquetSinkSpec asserts the promise: per-file ranges are
    * DISJOINT and the range predicate reaches the scan pushed-down. */
  def writeRangeLayout(
      df: DataFrame,
      path: String,
      rangeCols: Seq[String],
      nFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(rangeCols.nonEmpty, "rangeCols must be non-empty")
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    df.repartitionByRange(nFiles, rangeCols.map(col): _*)
      .sortWithinPartitions(rangeCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Z-order-clustered landing — [[writeRangeLayout]] for MULTI-column
    * filter patterns (the Delta/Iceberg `OPTIMIZE ZORDER BY` shape): rows
    * are range-partitioned and sorted on the Morton interleave of the
    * given integral columns ([[graft.operators.ZOrder.zCode]]), so every
    * output file covers a tight value range on EVERY z-column and a
    * filter on ANY of them skips most files/row groups — where a single-
    * column range layout serves only its leading column. The z key is
    * layout-only (dropped before write); ZOrderSpec asserts the promise
    * comparatively: per-file spans on BOTH dimensions beat the hash
    * layout's. Same nFiles sizing rule as [[writeRangeLayout]]; doubles
    * must be quantized to integer columns first. */
  def writeZOrderLayout(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      nFiles: Int,
      bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(zCols.nonEmpty, "zCols must be non-empty")
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    graft.operators.ZOrder.zCode(df, zCols, bits, "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** [[writeZOrderLayout]]'s Hilbert twin for exactly two columns —
    * same bucket-index-range-sort write, the index swapped for
    * [[graft.operators.ZOrder.hilbertCode2D]]: the curve's unit-step
    * locality makes each file's min/max box SQUARER than the Z-curve's
    * (q191 measures the difference on identical data), so box
    * predicates on the two columns skip at least as well. Prefer this
    * over Z-order when exactly two columns dominate the filter
    * workload; Z-order generalizes to more dimensions, this does not
    * (2-D only by construction). */
  def writeHilbertLayout(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      nFiles: Int,
      bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    val Z = graft.operators.ZOrder
    val bounds = df.agg(
      org.apache.spark.sql.functions.min(col(xCol).cast("long")),
      org.apache.spark.sql.functions.max(col(xCol).cast("long")),
      org.apache.spark.sql.functions.min(col(yCol).cast("long")),
      org.apache.spark.sql.functions.max(col(yCol).cast("long"))).head()
    require(!bounds.isNullAt(0) && !bounds.isNullAt(2),
      s"writeHilbertLayout: $xCol/$yCol need non-null values")
    val bx = Z.intBucket(col(xCol), bounds.getLong(0), bounds.getLong(1), bits)
    val by = Z.intBucket(col(yCol), bounds.getLong(2), bounds.getLong(3), bits)
    Z.hilbertCode2D(df.withColumns(Map("__bx" -> bx, "__by" -> by)),
        col("__bx"), col("__by"), bits, "__h")
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__bx", "__by", "__h")
      .write.mode(mode).parquet(path)
  }
}
