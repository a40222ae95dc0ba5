package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** S8's streaming leg (SURVEY.md §1.2): the same parquet corpus read as a
  * STREAM — file source with an explicit schema, Trigger.AvailableNow
  * draining all present files, results equal to the batch read. This is
  * the production ingest shape (drop files in a directory, stream them
  * exactly-once); MemoryStream elsewhere is only the test driver. */
class FileStreamSpec extends SparkSpecBase {

  test("readStream over the events parquet equals the batch read (AvailableNow)") {
    val s = spark
    // readStream demands an explicit schema; take the one the batch
    // reader infers so both testdata generations (TIMESTAMP(NANOS)-as-
    // Long and native TIMESTAMP(MICROS)) stream with their actual type
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema

    // the file source ingests directories (files dropped in over time);
    // stage the fixture file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_filestream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))

    val stream = s.readStream.schema(schema)
      .parquet(dir.toString)
      .groupBy("event_type").agg(count(lit(1)).as("n"))

    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("filestream_spec").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val streamed = s.table("filestream_spec").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.core.Tables.load(s, sfDir, "events")
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
