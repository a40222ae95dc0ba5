package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.SparkSpecBase
import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The LLM near-dup operators compose with the streaming surface: SimHash
  * signatures are a stateless per-row kernel map, so running them inside
  * `foreachBatch` over micro-batches must reproduce the batch run exactly
  * — the shape of a production incremental-dedup ingest (signatures
  * computed on arrival, banded pair search over the accumulated index). */
class StreamingNearDupSpec extends SparkSpecBase {

  test("simHash signatures per micro-batch equal the one-shot batch run") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length >= 30, "fixture too small for a 3-chunk stream")

    val expected = Dedup.simHashSignatures(
        docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, Long]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.simHashSignatures(batch)
          .collect().foreach(r => got.put(r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    try {
      docs.grouped(math.max(docs.length / 3, 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(got.asScala.toMap === expected,
      "micro-batch signatures must be bit-identical to the batch run")
  }

  test("overlapAgainst per micro-batch with precomputed corpus fps equals the batch gate") {
    val s = spark
    import s.implicits._
    val all = Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (incoming, corpus) = all.partition(_._1 % 5 == 0)
    val corpusDf = corpus.toSeq.toDF("doc_id", "text")

    val expected = Dedup.overlapAgainst(corpusDf, incoming.toSeq.toDF("doc_id", "text"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    // the precompute-once contract under streaming: corpus fingerprinted
    // ONCE before the stream starts, every micro-batch probes that frame
    val corpusFps = Dedup.winnowingFingerprints(corpusDf)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[(Long, Long), Long]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.overlapAgainst(corpusDf, batch, corpusFps = Some(corpusFps))
          .collect().foreach(r => got.put((r.getLong(0), r.getLong(1)), r.getLong(2)))
        ()
      }
      .start()
    try {
      incoming.grouped(math.max(incoming.length / 3, 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally { q.stop(); corpusFps.unpersist() }

    assert(got.asScala.toMap === expected,
      "per-micro-batch admission verdicts must equal the one-shot batch gate")
  }
}
