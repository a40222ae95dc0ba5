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

  /** Raw text shards, one row per LINE: (value, src_file) — the landing
    * format of line-delimited crawl dumps. Line splitting is Hadoop's
    * splittable TextInputFormat, so a shard bigger than a split is read
    * by several tasks in parallel; `input_file_name` rides along because
    * provenance (which shard a line came from) is the first thing a
    * curation pipeline needs for audits and re-drives. No schema
    * parameter: the format has exactly one column by construction. */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("src_file", org.apache.spark.sql.functions.input_file_name())

  /** One row per FILE: (value = whole contents, src_file) — the
    * document-per-file layout (scraped pages, markdown corpora).
    * `wholetext` makes the FILE the record, so a file is never split
    * across tasks — parallelism comes from file count, which is exactly
    * right for this layout (and why big corpora should prefer line- or
    * parquet-sharded landing; this reader exists for the long tail that
    * arrives as files). */
  def wholeTextDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("src_file", org.apache.spark.sql.functions.input_file_name())

  /** Streaming variant of [[textLines]] — tail a landing directory of
    * text shards into the curation pipeline (same provenance column). */
  def textLinesStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)
      .withColumn("src_file", org.apache.spark.sql.functions.input_file_name())

  /** ORC readers — the OTHER columnar interchange format a warehouse
    * hands a pipeline (Hive-era lakes land ORC the way modern ones land
    * parquet). Spark's native vectorized ORC reader gives the same
    * pushdown/pruning contract as parquet (predicate pushdown including
    * bloom/min-max skipping, column projection to the scan — the q01
    * PushedFilters discipline applies verbatim; FileSourcesSpec asserts
    * the round trip and the pushed scan shape). Schema stays explicit
    * for the same single-pass reasons as CSV/JSON — ORC carries its own
    * schema, so here the parameter is a CONTRACT CHECK rather than an
    * inference dodge: INCOMPATIBLE landing schemas fail loud at read,
    * while compatible mismatches up-cast per Spark's ORC conversion
    * (a long read as string renders — spec'd, so the semantics are a
    * documented choice, not a surprise); pass `schema = null` to trust
    * the files. */
  def orc(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).orc(path)
  }

  def orcStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).orc(path)
}
