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

  /** Apply the engine's standard configuration to a builder. */
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder = {
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
  }

  /** Local session for tests / ad-hoc use. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores)
      .appName("graft")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
