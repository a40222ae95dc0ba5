package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Global-offset and packing contracts: exact agreement with a local
  * cumulative sum, invariance to input partitioning (the property the
  * two-pass prefix shape must guarantee), token conservation, and the
  * pack geometry invariants. */
class PackingSpec extends SparkSpecBase {

  private lazy val chunks = Chunker.tokenChunks(
    Tables.load(spark, sfDir, "documents"), size = 16, stride = 16)

  private def collectOffsets(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("doc_id", "chunk_idx", "n_chunk_tokens", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("offsets equal a local exclusive cumulative sum") {
    val got = collectOffsets(Packing.withGlobalOffset(
      chunks, Seq("doc_id", "chunk_idx"), "n_chunk_tokens"))
    var run = 0L
    got.foreach { case (d, c, w, o) =>
      assert(o === run, s"doc $d chunk $c")
      run += w
    }
    assert(run === got.map(_._3).sum)
  }

  test("offsets are invariant to input partitioning and order") {
    val straight = collectOffsets(Packing.withGlobalOffset(
      chunks, Seq("doc_id", "chunk_idx"), "n_chunk_tokens"))
    val scrambled = collectOffsets(Packing.withGlobalOffset(
      chunks.repartition(7, col("chunk_text")),
      Seq("doc_id", "chunk_idx"), "n_chunk_tokens"))
    assert(straight === scrambled)
  }

  test("pack geometry: position bounds, cut detection, conservation") {
    val b = 64L
    val packed = Packing.packSequences(
        chunks, Seq("doc_id", "chunk_idx"), "n_chunk_tokens", b)
      .select("n_chunk_tokens", "offset", "pack_id", "pack_pos", "crosses_pack")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(packed.nonEmpty)
    packed.foreach { case (w, off, pid, pos, crosses) =>
      assert(pid === off / b)
      assert(pos === off % b && pos >= 0 && pos < b)
      assert(crosses === ((off + w - 1) / b > pid), s"offset $off width $w")
    }
    // every full window is exactly covered: total tokens span
    // [0, sum) with no gaps by the cumsum construction
    val total = packed.map(_._1).sum
    assert(packed.map(t => t._2 + t._1).max === total)
  }

  test("pack geometry survives a non-identifier weight column name") {
    val b = 64L
    val renamed = chunks.withColumnRenamed("n_chunk_tokens", "n-chunk-tokens")
    val packed = Packing.packSequences(
        renamed, Seq("doc_id", "chunk_idx"), "n-chunk-tokens", b)
      .select("n-chunk-tokens", "offset", "pack_id", "crosses_pack")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(packed.nonEmpty)
    // the dashed name must resolve as ONE column inside the DIV
    // expression, not parse as n - chunk - tokens
    packed.foreach { case (w, off, pid, crosses) =>
      assert(crosses === ((off + w - 1) / b > pid), s"offset $off width $w")
    }
  }

  test("non-integral weight column fails fast") {
    intercept[IllegalArgumentException] {
      Packing.withGlobalOffset(
        chunks.withColumn("wd", col("n_chunk_tokens").cast("double")),
        Seq("doc_id", "chunk_idx"), "wd")
    }
  }
}
