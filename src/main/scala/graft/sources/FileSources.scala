package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines readers beside the parquet loaders (`core.Tables`) —
  * the ingest formats a pipeline meets in practice before it lands on
  * columnar storage.
  *
  * Schema is REQUIRED, never inferred: at corpus scale inference is a
  * second full pass over the data before the first real job, and its
  * type guesses drift with the sample (a column of numeric-looking ids
  * silently becomes LONG in one batch and STRING in the next). An
  * explicit `StructType` keeps the scan single-pass, the types stable
  * across batches, and the malformed-row contract checkable.
  *
  * Malformed rows: PERMISSIVE (default) nulls unparseable columns and,
  * when the schema carries a `_corrupt_record` string column, routes the
  * raw line there for quarantine-style handling; FAILFAST turns the
  * first bad row into a job error. Both are the engine user's explicit
  * choice via `mode`.
  */
object FileSources {

  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ",",
      mode: String = "PERMISSIVE",
      timestampNTZFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", mode)
      // how TIMESTAMP_NTZ schema columns parse their (timezone-naive)
      // text; overridable per call like header/delimiter/mode
      .option("timestampNTZFormat", timestampNTZFormat)
      .csv(path)

  /** JSON Lines (one object per line — the splittable layout; multiline
    * JSON documents are not splittable and do not belong on a cluster). */
  def jsonLines(
      spark: SparkSession,
      path: String,
      schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", mode)
      .json(path)

  /** Streaming variants: identical schema contract (Structured Streaming
    * requires an explicit schema on file sources anyway — the batch
    * readers above simply refuse to be weaker). */
  def csvStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ",",
      timestampNTZFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("timestampNTZFormat", timestampNTZFormat)
      .csv(path)

  def jsonLinesStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)
}
