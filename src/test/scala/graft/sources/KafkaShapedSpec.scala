package graft.sources

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped ingest contract (r9 verdict item 8): the wire-schema
  * adapters spec'd against MemoryStream semantics, and the real reader's
  * wiring pinned by the error it raises in this connector-less sandbox. */
class KafkaShapedSpec extends SparkSpecBase {

  private val payloadSchema = StructType(Seq(
    StructField("user", LongType), StructField("action", StringType)))

  test("encode produces exactly the Kafka wire schema; same key, same partition") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """{"user":1,"action":"view"}""", Timestamp.valueOf("2024-01-01 10:00:00"), 0L),
      (2L, """{"user":2,"action":"click"}""", Timestamp.valueOf("2024-01-01 10:00:01"), 1L),
      (1L, """{"user":1,"action":"buy"}""", Timestamp.valueOf("2024-01-01 10:00:02"), 2L))
      .toDF("k", "v", "ts", "off")
    val wire = KafkaShaped.encode(df, "events", col("k"), col("v"),
      col("ts"), col("off"), numPartitions = 4)
    // names + types are the contract; nullability tightens when inputs
    // are literals/non-null (e.g. topic, timestampType), which is fine
    assert(wire.schema.fields.toSeq.map(f => (f.name, f.dataType)) ===
      KafkaShaped.wireSchema.fields.toSeq.map(f => (f.name, f.dataType)))
    val rows = wire.collect()
    assert(rows.forall { r =>
      val p = r.getInt(3); p >= 0 && p < 4
    }, "partition must land in [0, numPartitions)")
    val byKey = rows.groupBy(r => new String(r.getAs[Array[Byte]](0), "UTF-8"))
    assert(byKey("1").map(_.getInt(3)).distinct.length === 1,
      "Kafka's default-partitioner property: one key, one partition")
    assert(rows.forall(_.getInt(6) === 0), "timestampType = CreateTime")
  }

  test("decodeJson roundtrips the payload and carries wire metadata; malformed -> nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, """{"user":1,"action":"view"}""", Timestamp.valueOf("2024-01-01 10:00:00"), 0L),
      (9L, """not json at all""", Timestamp.valueOf("2024-01-01 10:00:01"), 1L))
      .toDF("k", "v", "ts", "off")
    val decoded = KafkaShaped.decodeJson(
      KafkaShaped.encode(df, "t", col("k"), col("v"), col("ts"), col("off"), 2),
      payloadSchema)
    assert(decoded.columns.toSeq ===
      Seq("key", "topic", "partition", "offset", "timestamp",
        "tombstone", "corrupt", "user", "action"))
    val byOff = decoded.collect().map(r => r.getLong(3) -> r).toMap
    assert(byOff(0L).getLong(7) === 1L && byOff(0L).getString(8) === "view")
    assert(!byOff(0L).getBoolean(6) && new String(
      byOff(0L).getAs[Array[Byte]](0), "UTF-8") === "1",
      "valid payload is not corrupt; message key carried for bookkeeping")
    assert(byOff(1L).getBoolean(6),
      "malformed payload flags corrupt=true (dead-letter routable), not a crash")
  }

  test("decodeJson: tombstones and empty payloads are distinguished from parsed nulls") {
    val s = spark
    import s.implicits._
    // wire rows built directly: a tombstone (null value), an empty-byte
    // payload, and a legitimately all-null parsed object
    val wire = Seq(
      (Array[Byte](49), null.asInstanceOf[Array[Byte]], "t", 0, 0L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 0),
      (Array[Byte](50), Array.empty[Byte], "t", 0, 1L,
        Timestamp.valueOf("2024-01-01 10:00:01"), 0),
      (Array[Byte](51), """{"user":null,"action":null}""".getBytes("UTF-8"), "t", 0, 2L,
        Timestamp.valueOf("2024-01-01 10:00:02"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val rows = KafkaShaped.decodeJson(wire, payloadSchema)
      .collect().map(r => r.getLong(3) -> ((r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(rows(0L) === ((true, false)),
      "null value = tombstone, NOT corrupt (a delete marker is not bad data)")
    assert(rows(1L) === ((false, true)),
      "empty bytes = corrupt (unparseable non-null value), not a tombstone")
    assert(rows(2L) === ((false, false)),
      "a parsed all-null object is neither tombstone nor corrupt")
  }

  test("decodeJson rejects payload fields colliding with wire/flag columns") {
    val bad = StructType(Seq(StructField("key", StringType)))
    val wire = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), KafkaShaped.wireSchema)
    val e = intercept[IllegalArgumentException](KafkaShaped.decodeJson(wire, bad))
    assert(e.getMessage.contains("collide"))
  }

  test("encode passes pre-encoded binary payloads through byte-identical") {
    val s = spark
    import s.implicits._
    // 0xFF is not valid UTF-8: a string round-trip would fold it to
    // U+FFFD and change both the payload and its partition hash
    val raw = Array[Byte](0x00, 0x7f, -1, 0x42)
    val df = Seq((Array[Byte](1, -1), raw,
        Timestamp.valueOf("2024-01-01 10:00:00"), 0L))
      .toDF("k", "v", "ts", "off")
    val row = KafkaShaped.encode(df, "t", col("k"), col("v"),
      col("ts"), col("off"), 4).collect().head
    assert(row.getAs[Array[Byte]](0).toSeq === Seq[Byte](1, -1))
    assert(row.getAs[Array[Byte]](1).toSeq === raw.toSeq)
  }

  test("the adapters run identically over a STREAM (MemoryStream standing in for the topic)") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[(Long, String, Timestamp, Long)](s)
    val wire = KafkaShaped.encode(ms.toDS().toDF("k", "v", "ts", "off"),
      "events", col("k"), col("v"), col("ts"), col("off"), 4)
    // the standard consume topology: decode, watermark on the wire
    // timestamp, per-action count
    val counts = KafkaShaped.decodeJson(wire, payloadSchema)
      .withWatermark("timestamp", "10 minutes")
      .groupBy("action").count()
    val q = counts.writeStream.outputMode("complete").format("memory")
      .queryName("kafka_shaped_spec").start()
    try {
      ms.addData(
        (1L, """{"user":1,"action":"view"}""", Timestamp.valueOf("2024-01-01 10:00:00"), 0L),
        (2L, """{"user":2,"action":"view"}""", Timestamp.valueOf("2024-01-01 10:00:01"), 1L),
        (1L, """{"user":1,"action":"buy"}""", Timestamp.valueOf("2024-01-01 10:00:02"), 2L))
      q.processAllAvailable()
      val out = s.table("kafka_shaped_spec").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out === Map("view" -> 2L, "buy" -> 1L))
    } finally q.stop()
  }

  test("reader wires the real kafka format: in this jar-less sandbox it must fail at load()") {
    val e = intercept[Exception] {
      KafkaShaped.reader(spark, "broker:9092", "events",
        startingOffsets = "earliest", maxOffsetsPerTrigger = Some(1000L))
    }
    val msg = String.valueOf(e.getMessage).toLowerCase
    assert(msg.contains("kafka"),
      s"expected Spark's kafka data-source-not-found error, got: $msg")
  }
}
