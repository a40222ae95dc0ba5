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
