package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration for the engine.
  *
  * Design notes (SURVEY.md §7.1): the engine is declarative Spark end to end —
  * Catalyst owns optimization, AQE owns runtime re-planning. We only pin the
  * configs that correctness or the test environment require:
  *
  *  - UTC session timezone: the DuckDB oracle runs in UTC; timestamp bucketing
  *    must agree (FIXTURES.md).
  *  - `spark.sql.legacy.parquet.nanosAsLong`: earlier driver-generated
  *    `events.parquet` stored `ts` as parquet TIMESTAMP(NANOS) which Spark's
  *    vectorized reader rejects; with this flag it reads as nanos-since-epoch
  *    LongType and [[Tables]] converts to TIMESTAMP_NTZ (truncated to micros,
  *    exactly matching DuckDB's nanos→micros truncation). Round-10 testdata
  *    ships native TIMESTAMP(MICROS), where the flag is inert — kept so both
  *    generations read correctly ([[Tables.load]] dispatches on the type).
  *  - shuffle partitions sized to the local core count (32 on the driver's
  *    bench box, not the 200 default). On a real cluster this would be left to
  *    AQE coalescing with a high initial partition number.
  */
object GraftSession {

  /** The engine's standard configuration as PURE DATA — [[configure]]
    * applies it; the profile spec asserts invariants on these maps
    * directly (no Builder-internals reflection). */
  def localConf(cores: Int): Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (32L * 1024 * 1024).toString,
    "spark.ui.enabled" -> "false")

  /** [[cluster]]'s configuration as pure data: [[localConf]] with the
    * sizing/debugging overrides documented on [[cluster]]. */
  def clusterConf(clusterCores: Int): Map[String, String] =
    localConf(clusterCores) ++ Map(
      "spark.ui.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
        (3L * clusterCores).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        (128L * 1024 * 1024).toString,
      "spark.sql.files.maxPartitionBytes" ->
        (256L * 1024 * 1024).toString)

  /** Apply the engine's standard configuration to a builder. */
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    localConf(cores).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Local session for tests / ad-hoc use. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores)
      .appName("graft")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The PRODUCTION profile the local configuration stands in for — what
    * changes when this engine moves from local[32] to a 1000-executor
    * cluster reading 100 TB. Same correctness-pinned configs as
    * [[configure]] (UTC, extensions, AQE family), different sizing
    * strategy:
    *
    *  - AQE owns the real partitioning, seeded with a HIGH
    *    `initialPartitionNum` (rule of thumb: 2–3× total cores, here
    *    `3 × clusterCores`) so coalescing works downward — a low seed
    *    cannot be split upward and is the classic 100 TB spill cliff;
    *    `shuffle.partitions` (= clusterCores, from [[configure]]) is
    *    only the fallback for the few AQE-ineligible stages;
    *  - the Spark UI comes back ON — [[configure]] disables it for the
    *    bench box, but on a real cluster it is the primary debugging
    *    surface for exactly the skew/spill behavior this profile tunes;
    *  - `advisoryPartitionSizeInBytes` 128 MB: the coalesce/skew target,
    *    sized so a post-shuffle partition fits executor memory with room
    *    for the hash side of joins;
    *  - `files.maxPartitionBytes` 256 MB: fewer, fuller scan tasks on
    *    large parquet (the default 128 MB doubles task count for pure
    *    scan stages; columnar pruned reads tolerate the larger slice);
    *  - broadcast threshold stays 32 MB — the same small-side rule every
    *    operator here was designed against (dims broadcast, corpus never
    *    does);
    *  - `skewJoin` stays on: the salting operator ([[graft.operators.Skew]])
    *    covers deliberate pre-salting, AQE covers what profiling missed.
    *
    * Everything correctness-visible is IDENTICAL to local (spec-asserted),
    * so a plan validated by the oracle gate behaves the same on the
    * cluster — only parallelism/sizing differ. */
  def cluster(b: SparkSession.Builder, clusterCores: Int): SparkSession.Builder = {
    require(clusterCores >= 1, s"clusterCores $clusterCores must be >= 1")
    clusterConf(clusterCores).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
