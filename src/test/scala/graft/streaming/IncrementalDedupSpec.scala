package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The ingest-time new-content gate: a streaming source anti-joined
  * against the historical corpus's hash set must pass exactly the docs
  * whose content was never seen — across micro-batch boundaries, with
  * the static side fixed at query start. */
class IncrementalDedupSpec extends SparkSpecBase {

  test("stream-static anti join passes only never-seen content") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "seen text alpha"),
      (2L, "seen text beta"),
      (3L, "seen text gamma")).toDF("doc_id", "text")

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, String]()
    val q = Dedup.newContentOnly(ms.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => got.put(r.getLong(0), r.getString(1)))
        ()
      }
      .start()
    try {
      // batch 1: one dup of the corpus, one genuinely new
      ms.addData((10L, "seen text beta"), (11L, "fresh text one"))
      q.processAllAvailable()
      // batch 2: dup of the corpus again + new + repeat of batch-1 new
      // content (passes: within-stream dedup is explicitly out of scope)
      ms.addData((12L, "seen text alpha"), (13L, "fresh text two"),
        (14L, "fresh text one"))
      q.processAllAvailable()
    } finally q.stop()

    assert(got.asScala.toMap === Map(
      11L -> "fresh text one",
      13L -> "fresh text two",
      14L -> "fresh text one"))
  }

  test("batch form: schema preserved, seen content dropped") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "old")).toDF("doc_id", "text")
    val incoming = Seq((2L, "old"), (3L, "new")).toDF("doc_id", "text")
    val out = Dedup.newContentOnly(incoming, corpus)
    assert(out.columns.toSeq === Seq("doc_id", "text"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((3L, "new")))
  }

  test("ingest-time span cut: streamed batches against a static window set == batch removal") {
    val s = spark
    import s.implicits._
    // corpus plants one duplicated 4-token window: "a b c d"
    val corpus = Seq(
      (1L, "a b c d e1 e2"),
      (2L, "f1 f2 a b c d"),
      (3L, "g1 g2 g3 g4 g5")).toDF("doc_id", "text")
    val dupWindows = Dedup.duplicatedWindowHashes(corpus, n = 4).cache()

    val incoming = Seq(
      (10L, "x1 x2 a b c d x3"), // contains the corpus span -> cut
      (11L, "y1 y2 y3 y4 y5"),   // clean -> untouched
      (12L, "a b c d"))          // IS the span -> emptied
    val expected = Dedup.removeSpansMatching(incoming.toDF("doc_id", "text"),
        dupWindows, n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(expected === Map(10L -> "x1 x2 x3", 11L -> "y1 y2 y3 y4 y5", 12L -> ""))

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, String]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.removeSpansMatching(batch, dupWindows, n = 4)
          .collect().foreach(r => got.put(r.getLong(0), r.getString(3)))
        ()
      }
      .start()
    try {
      ms.addData(incoming.take(2): _*)
      q.processAllAvailable()
      ms.addData(incoming.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.asScala.toMap === expected,
      "micro-batched span cut must equal the batch form against the same static set")
  }

  test("ingest-time NEAR-dup gate: streamed batches against precomputed corpus bands == batch form") {
    val s = spark
    import s.implicits._
    // near-identical pairs must cross the 3-gram Jaccard bar, exact
    // matches too; the clean doc shares nothing
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus content about spark windows"),
      (3L, "shared prefix tokens one two three four five six seven")).toDF("doc_id", "text")
    // precompute-once contract: the corpus bands are the static artifact
    val bands = Dedup.minHashBandsPortable(corpus).cache()

    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),  // exact dup -> drop
      (11L, "the quick brown fox jumps over the lazy cat tonight"),  // near dup -> drop
      (12L, "entirely novel text with no overlap whatsoever here"),  // clean -> pass
      (13L, "shared prefix tokens one two three four five six eight")) // near dup -> drop
    val expected = Dedup.newContentOnlyNear(
        incoming.toDF("doc_id", "text"), corpus, minJaccard = 0.4,
        corpusBands = Some(bands))
      .collect().map(_.getLong(0)).toSet
    assert(expected === Set(12L), "gate must drop exact + near dups, pass clean")

    val ms = MemoryStream[(Long, String)](s)
    val got = new ConcurrentHashMap[Long, String]()
    val q = ms.toDS().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.newContentOnlyNear(batch, corpus, minJaccard = 0.4,
            corpusBands = Some(bands))
          .collect().foreach(r => got.put(r.getLong(0), r.getString(1)))
        ()
      }
      .start()
    try {
      ms.addData(incoming.take(2): _*)
      q.processAllAvailable()
      ms.addData(incoming.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.asScala.keySet === expected,
      "micro-batched near-dup gate must equal the batch form against the same bands")
  }
}
