package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Built-in continuous sources for load/soak testing (SURVEY.md §2.1 S9):
  * the `rate` source is the engine-generated infinite stream — the only
  * "real" (non-file, non-memory) source available in this build (no Kafka
  * connector jars in the sandbox), and the shape a Kafka-backed ingest
  * would slot into: `readStream` → the same transforms → `writeStream`.
  *
  * Scale note: `numPartitions` controls source parallelism exactly like
  * Kafka topic partitions would — downstream stateful operators inherit
  * it until the first shuffle.
  */
object RateSource {

  /** (timestamp, value) rows at `rowsPerSecond`, `numPartitions`-way
    * parallel, with an optional ramp-up. */
  def stream(
      spark: SparkSession,
      rowsPerSecond: Int,
      numPartitions: Int = 1,
      rampUpSeconds: Int = 0): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .option("numPartitions", numPartitions.toLong)
      .option("rampUpTime", s"${rampUpSeconds}s")
      .load()

  /** The reference's demo topology on the rate source: key the stream,
    * count per key with update-mode semantics — the minimal stateful
    * pipeline a soak harness watches. */
  def keyedCounts(spark: SparkSession, rowsPerSecond: Int, keys: Int): DataFrame =
    stream(spark, rowsPerSecond)
      .select(pmod(col("value"), lit(keys.toLong)).as("k"))
      .groupBy("k").count()
}
