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

  test("withGroupedOffset equals the window exclusive cumsum per group") {
    val s2 = spark; import s2.implicits._
    val df = Seq(
      ("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 2L),
      ("b", 4L, 7L), ("b", 5L, 1L),
      ("c", 6L, 4L))
      .toDF("g", "id", "w")
    val got = Packing.withGroupedOffset(df.repartition(5), Seq("g"),
        Seq(col("id")), "w", "off")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // exclusive per-group cumsum in id order
    assert(got === Set(
      ("a", 1L, 0L), ("a", 2L, 3L), ("a", 3L, 8L),
      ("b", 4L, 0L), ("b", 5L, 7L),
      ("c", 6L, 0L)))
  }

  test("withGroupedOffset is partition-invariant and matches the global form on one group") {
    val s2 = spark; import s2.implicits._
    val df = (1L to 200L).map(i => ("only", i, i % 7 + 1)).toDF("g", "id", "w")
    val grouped = Packing.withGroupedOffset(df.repartition(13), Seq("g"),
        Seq(col("id")), "w", "off")
      .select("id", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = Packing.withGlobalOffset(df, Seq("id"), "w", "off")
      .select("id", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grouped === global)
  }

  test("withGroupedOffset equals a driver-side grouped cumsum on randomized input") {
    val s2 = spark; import s2.implicits._
    for (seed <- Seq(5, 42)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 150L).map(i =>
        (s"g${rnd.nextInt(4)}", i, rnd.nextInt(9).toLong + 1L))
      val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(_._2).foldLeft((0L, List.empty[(Long, Long)])) {
          case ((run, acc), (_, id, w)) => (run + w, (id, run) :: acc)
        }._2
      }.toSet
      val got = Packing.withGroupedOffset(
          rows.toDF("g", "id", "w").repartition(1 + rnd.nextInt(16)),
          Seq("g"), Seq(col("id")), "w", "off")
        .select("id", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("paddingWaste: hand-computed pad vs pack costs at L=10") {
    val s2 = spark; import s2.implicits._
    // token counts 3, 12, 10 -> pad costs 10, 20, 10 (padded 40, waste
    // 15/40); packed tape = ceil(25/10)*10 = 30 (waste 5/30)
    val df = Seq(
      ("s1", "a b c"),
      ("s1", Seq.fill(12)("t").mkString(" ")),
      ("s1", Seq.fill(10)("t").mkString(" ")))
      .toDF("source", "text")
    val r = Packing.paddingWaste(df, contextLen = 10L).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(5)) ===
      ((3L, 25L, 40L, 30L)))
    assert(row.getDouble(4) === 0.375)
    assert(math.abs(row.getDouble(6) - 5.0 / 30.0) < 5e-5)
  }

  test("paddingWaste: exact-multiple docs waste nothing either way") {
    val s2 = spark; import s2.implicits._
    val df = Seq(("s1", Seq.fill(8)("t").mkString(" "))).toDF("source", "text")
    val row = Packing.paddingWaste(df, contextLen = 4L).collect().head
    assert(row.getDouble(4) === 0.0 && row.getDouble(6) === 0.0)
    assert(row.getLong(3) === 8L && row.getLong(5) === 8L)
  }

  test("packBoundaries: segment manifest in position order; straddler listed at its start pack") {
    val s2 = spark; import s2.implicits._
    // chunks: doc A 6 tokens, doc B 3, doc C 4 — window 8:
    // offsets 0, 6, 9 -> packs 0, 0, 1; B (offset 6, len 3) straddles
    val chunks = Seq(("A", 0L, 6L), ("B", 0L, 3L), ("C", 0L, 4L))
      .toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    val packed = Packing.packSequences(chunks, Seq("doc_id", "chunk_idx"),
      "n_chunk_tokens", 8L)
    val out = Packing.packBoundaries(packed, "doc_id", "n_chunk_tokens")
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 9L, "0:A:6,6:B:3"),   // B counted where it STARTS
      (1L, 1L, 4L, "1:C:4")))
  }
}
