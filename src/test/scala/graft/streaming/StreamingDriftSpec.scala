package graft.streaming

import graft.SparkSpecBase
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** The drift monitor's streaming composition: per-micro-batch
  * [[Quality.distributionDriftAgainst]] over a PRECOMPUTED reference LM
  * equals the batch form on the same data — the foreachBatch contract the
  * ingest gates (IncrementalDedupSpec) established, in LM space. */
class StreamingDriftSpec extends SparkSpecBase {

  test("per-micro-batch drift against a static LM == batch form per batch") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "x x y z w"), (2L, "x y y z q"), (3L, "w q x y z")
    ).toDF("doc_id", "text")
    val lm = Quality.unigramLm(corpus)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    lm.count() // materialize once; micro-batches probe the cache

    val b1 = Seq((10L, "x y z", "a"), (11L, "q q q", "b"))
    val b2 = Seq((12L, "totally unseen tokens", "a"), (13L, "x x y", "c"))

    def batchForm(rows: Seq[(Long, String, String)]): Map[String, Double] =
      Quality.distributionDriftAgainst(
          rows.toDF("doc_id", "text", "source"), lm)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val ms = MemoryStream[(Long, String, String)](s)
    val got = new ConcurrentHashMap[Long, Map[String, Double]]()
    val q = ms.toDS().toDF("doc_id", "text", "source")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        got.put(id,
          Quality.distributionDriftAgainst(batch, lm)
            .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
        ()
      }
      .start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val batches = got.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(batches === Seq(batchForm(b1), batchForm(b2)),
      "micro-batched drift must equal the batch form against the same static LM")
    // unseen-token slice must register the largest drift in its batch
    assert(batches(1)("a") > batches(1)("c"),
      "a fully-unseen slice must out-drift an in-distribution one")
  }
}
