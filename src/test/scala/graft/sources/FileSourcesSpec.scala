package graft.sources

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

class FileSourcesSpec extends SparkSpecBase {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fs_$tag").toString

  test("CSV round-trip: fixture table -> csv -> back, schema-exact and value-exact") {
    val nation = Tables.load(spark, sfDir, "nation").orderBy("n_nationkey")
    val dir = tmpDir("csv")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = FileSources.csv(spark, dir, nation.schema).orderBy("n_nationkey")
    assert(back.schema === nation.schema)
    assert(back.collect().toSeq === nation.collect().toSeq)
  }

  test("JSON-lines round-trip: fixture table -> jsonl -> back, value-exact") {
    val region = Tables.load(spark, sfDir, "region").orderBy("r_regionkey")
    val dir = tmpDir("json")
    region.write.mode("overwrite").json(dir)
    val back = FileSources.jsonLines(spark, dir, region.schema).orderBy("r_regionkey")
    assert(back.schema === region.schema)
    assert(back.collect().toSeq === region.collect().toSeq)
  }

  test("malformed CSV rows: PERMISSIVE quarantines via _corrupt_record, FAILFAST throws") {
    val dir = tmpDir("bad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      "k,v\n1,a\nnot_a_number,b\n2,c\n".getBytes("UTF-8"))
    val schema = new StructType()
      .add("k", "long").add("v", StringType).add("_corrupt_record", StringType)
    val rows = FileSources.csv(spark, dir, schema).collect()
    val bad = rows.filter(!_.isNullAt(2))
    assert(rows.length === 3)
    assert(bad.length === 1 && bad.head.getString(2).startsWith("not_a_number"))
    val e = intercept[Exception] {
      FileSources.csv(spark, dir,
        new StructType().add("k", "long").add("v", StringType),
        mode = "FAILFAST").collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("streaming CSV source delivers the same rows (AvailableNow batch parity)") {
    val supplier = Tables.load(spark, sfDir, "supplier")
    val dir = tmpDir("stream")
    supplier.write.mode("overwrite").option("header", "true").csv(dir)
    val stream = FileSources.csvStream(spark, dir, supplier.schema)
    assert(stream.isStreaming)
    val q = stream.writeStream
      .format("memory").queryName("fs_csv_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val got = spark.table("fs_csv_stream").orderBy("s_suppkey").collect().toSeq
    assert(got === supplier.orderBy("s_suppkey").collect().toSeq)
  }

  test("textLines: every line lands as a row with shard provenance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_text").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "shard-0.txt").toPath,
        "alpha doc one\nbeta doc two\n".getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "shard-1.txt").toPath,
        "gamma doc three\n".getBytes("UTF-8"))
      val rows = FileSources.textLines(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.length === 3)
      assert(rows.map(_._1).toSet ===
        Set("alpha doc one", "beta doc two", "gamma doc three"))
      rows.foreach { case (line, f) =>
        val expectShard = if (line.startsWith("gamma")) "shard-1" else "shard-0"
        assert(f.contains(expectShard), s"wrong provenance for '$line': $f")
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("wholeTextDocs: the file is the record, newlines preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_whole").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.md").toPath,
        "title\n\nbody line\n".getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "b.md").toPath,
        "second doc".getBytes("UTF-8"))
      val rows = FileSources.wholeTextDocs(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.length === 2)
      val byFile = rows.map { case (v, f) => f.split('/').last -> v }.toMap
      assert(byFile("a.md") === "title\n\nbody line\n")
      assert(byFile("b.md") === "second doc")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming text source tails a landing dir (AvailableNow parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_text_stream").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "s0.txt").toPath,
        "line one\nline two\n".getBytes("UTF-8"))
      val q = FileSources.textLinesStream(spark, dir.getAbsolutePath)
        .writeStream.format("memory").queryName("fs_text_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
      val got = spark.table("fs_text_stream").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.map(_._1).toSet === Set("line one", "line two"))
      assert(got.forall(_._2.contains("s0.txt")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("ORC round-trip: fixture table -> orc -> back, schema-exact; filters push to the scan") {
    val customer = Tables.load(spark, sfDir, "customer").orderBy("c_custkey")
    val dir = tmpDir("orc")
    customer.write.mode("overwrite").orc(dir)
    val back = FileSources.orc(spark, dir, customer.schema).orderBy("c_custkey")
    assert(back.schema === customer.schema)
    assert(back.collect().toSeq === customer.collect().toSeq)
    // the parquet pushdown discipline applies verbatim to the native ORC
    // reader: the predicate must reach the scan, not a post-scan Filter
    val plan = FileSources.orc(spark, dir, customer.schema)
      .where(col("c_custkey") === 7L).select("c_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]"),
      s"predicate did not push to the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"),
      s"column pruning did not reach the ORC scan:\n$plan")
    // schema-as-contract: Spark's ORC reader UP-CASTS compatible
    // mismatches (long column read as string yields the rendered value
    // — document, don't fight) and fails loud on incompatible ones
    val coerced = FileSources.orc(spark, dir, new StructType().add("c_custkey", StringType))
      .orderBy(col("c_custkey").cast("long")).limit(1).collect()
    assert(coerced.head.getString(0) === "0", "compatible mismatch up-casts")
    intercept[Exception] {
      FileSources.orc(spark, dir,
        new StructType().add("c_custkey", "array<long>")).collect()
    }
  }

  test("streaming ORC source delivers the same rows (AvailableNow parity)") {
    val region = Tables.load(spark, sfDir, "region")
    val dir = tmpDir("orcs")
    region.write.mode("overwrite").orc(dir)
    val q = FileSources.orcStream(spark, dir, region.schema)
      .writeStream.format("memory").queryName("fs_orc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.table("fs_orc_stream").orderBy("r_regionkey").collect().toSeq ===
      region.orderBy("r_regionkey").collect().toSeq)
  }
}
