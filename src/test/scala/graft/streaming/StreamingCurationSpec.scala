package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.SparkSpecBase
import graft.core.Tables
import graft.operators.{Chunker, Quality}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation operators are stateless per-document transforms, so
  * running them inside `foreachBatch` over micro-batches must reproduce
  * the batch run exactly — the shape of an incremental ingest pipeline
  * that quality-filters and chunks documents on arrival. */
class StreamingCurationSpec extends SparkSpecBase {

  private def docs: Seq[(Long, String)] =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("repetitionFilter per micro-batch equals the one-shot batch run") {
    val s = spark
    import s.implicits._
    val all = docs
    val expected = Quality.repetitionFilter(all.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, Seq[Any]]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Quality.repetitionFilter(batch)
          .collect().foreach(r => got.put(r.getLong(0), r.toSeq.tail))
        ()
      }
      .start()
    try {
      all.grouped(math.max(all.size / 3, 1)).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(got.asScala.toMap === expected,
      "per-batch metrics and verdicts must be identical to the batch run")
  }

  test("bloom-pruned eval flagging per micro-batch equals the one-shot run") {
    // ingest-time decontamination: an arriving train document is flagged
    // when it shares n-grams with the STATIC eval set. Role swap on
    // overlap(train, test): the eval set plays "train" (the reference
    // vocabulary), each micro-batch plays "test" (the side being
    // flagged) — per-doc verdicts depend only on that doc's grams vs the
    // static set, so micro-batching cannot change them.
    val s = spark
    import s.implicits._
    val all = docs
    val eval_ = all.filter(_._1 % 10 == 0).toDF("doc_id", "text")
    val train = all.filter(_._1 % 10 != 0)
    val expected = graft.operators.Decontaminate
      .overlapBloomPruned(eval_, train.toDF("doc_id", "text"), n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, (Long, Boolean)]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Decontaminate.overlapBloomPruned(eval_, batch, n = 5)
          .collect().foreach(r => got.put(r.getLong(0), (r.getLong(1), r.getBoolean(2))))
        ()
      }
      .start()
    try {
      train.grouped(math.max(train.size / 3, 1)).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(got.asScala.toMap === expected,
      "per-batch contamination verdicts must be identical to the batch run")
  }

  test("tokenChunks per micro-batch equals the one-shot batch run") {
    val s = spark
    import s.implicits._
    val all = docs
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val expected = Chunker.tokenChunks(
        all.toDF("doc_id", "text"), size = 16, stride = 12)
      .collect().map(r => key(r) -> (r.getLong(2), r.getString(3))).toMap

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[(Long, Long), (Long, String)]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Chunker.tokenChunks(batch, size = 16, stride = 12)
          .collect().foreach(r => got.put(key(r), (r.getLong(2), r.getString(3))))
        ()
      }
      .start()
    try {
      all.grouped(math.max(all.size / 2, 1)).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(got.asScala.toMap === expected,
      "per-batch chunks must be identical to the batch run")
  }
}
