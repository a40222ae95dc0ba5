package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the ten driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * All timestamps in the corpus are timezone-naive; orders/lineitem read
  * natively as TIMESTAMP_NTZ. `events.ts` is parquet TIMESTAMP(NANOS) which
  * Spark reads (under `nanosAsLong`) as a nanos LongType; we convert to
  * TIMESTAMP_NTZ via floor-division to micros — the same truncation DuckDB
  * applies when reading nanos into its microsecond TIMESTAMP, so the two
  * engines see byte-identical instants.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Read-path requirement for events.parquet (TIMESTAMP(NANOS)); a runtime
    // SQLConf, safe to set idempotently.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => df
    }
  }

  /** Register all tables as temp views (used by tests and SQL-level checks). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
