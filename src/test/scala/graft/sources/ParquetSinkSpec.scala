package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The parquet landing contracts: partitioned layout round-trips with
  * partition pruning and controlled file counts; the streaming sink lands
  * exactly the published rows. */
class ParquetSinkSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned write round-trips and prunes partitions on read") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = tmp("graft_sink_part")
    ParquetSink.writePartitioned(docs, out, Seq("lang"), sortCols = Seq("doc_id"))

    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // content parity (lang moved to the partition directory and back)
    val a = docs.select("doc_id", "lang", "n_chars").orderBy("doc_id").collect()
    val b = back.select("doc_id", "lang", "n_chars").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)

    // a lang filter must prune at the partition level, not scan-and-filter
    val pruned = back.where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() ===
      docs.where(col("lang") === "en").count())

    // one-task-per-value routing: each partition dir holds ONE data file
    // (500 fixture docs, no maxRecordsPerFile cap)
    val enFiles = new java.io.File(s"$out/lang=en")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(enFiles === 1, s"expected 1 file per partition value, got $enFiles")
  }

  test("maxRecordsPerFile splits a hot partition into sized files") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = tmp("graft_sink_cap")
    ParquetSink.writePartitioned(docs, out, Seq("lang"), maxRecordsPerFile = 50L)
    val en = docs.where(col("lang") === "en").count()
    val enFiles = new java.io.File(s"$out/lang=en")
      .listFiles().count(_.getName.endsWith(".parquet"))
    // ceil(en/50) files expected from the single routed task
    assert(enFiles === ((en + 49) / 50).toInt, s"got $enFiles files for $en rows")
    assert(spark.read.parquet(out).count() === docs.count())
  }

  test("streaming parquet sink lands published rows exactly once") {
    val s = spark; import s.implicits._
    val out = tmp("graft_sink_stream")
    val ckpt = tmp("graft_sink_ckpt")
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData((1L, "a"), (2L, "b"), (3L, "c"))
    val q = ParquetSink.streamParquet(
      mem.toDS().toDF("id", "v"), out, ckpt)
    q.awaitTermination()

    // a restart with the same checkpoint must not double-write old batches
    mem.addData((4L, "d"))
    val q2 = ParquetSink.streamParquet(mem.toDS().toDF("id", "v"), out, ckpt)
    q2.awaitTermination()

    val back = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("writeRangeLayout: files hold disjoint ranges; a bounded filter skips files") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = tmp("graft_sink_range")
    ParquetSink.writeRangeLayout(docs, out, Seq("doc_id"), nFiles = 8)

    val files = new java.io.File(out)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 8, s"expected 8 range files, got $files")

    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())

    // the layout property the operator promises: every file holds a
    // DISJOINT doc_id range (this is what lets a footer-/manifest-aware
    // reader skip whole files, and the in-file sort what lets Spark's
    // parquet reader skip row groups)
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("doc_id"), max("doc_id")).collect().head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges overlap: $aMax >= $bMin in ${ranges.toSeq}")
      case _ => ()
    }

    // and the filter must reach the parquet scan as a pushed filter
    val plan = back.where(col("doc_id") < 10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,10)"),
      s"expected the range predicate pushed to the scan:\n$plan")
    assert(back.where(col("doc_id") < 10).count() ===
      docs.where(col("doc_id") < 10).count())
  }
}
