package graft.operators

import graft.SparkSpecBase

/** Chunking contracts: exact window contents vs a brute-force slicer,
  * the short-doc pass-through, boundary chunk counts, full token
  * coverage, and the unpadded final window. */
class ChunkerSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def bruteChunks(text: String, size: Int, stride: Int): Seq[(Long, Long, String)] = {
    val toks = text.split("\\s+").toSeq
    val n = toks.size
    val nc = if (n <= size) 1 else math.ceil((n - size).toDouble / stride).toInt + 1
    (0 until nc).map { i =>
      val slice = toks.slice(i * stride, math.min(i * stride + size, n))
      (i.toLong, slice.size.toLong, slice.mkString(" "))
    }
  }

  private def run(text: String, size: Int, stride: Int): Seq[(Long, Long, String)] =
    Chunker.tokenChunks(Seq((0L, text)).toDF("doc_id", "text"),
        size = size, stride = stride)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("chunks match brute force across sizes, strides and doc lengths") {
    val words = (1 to 40).map(i => s"w$i")
    for {
      n <- Seq(1, 7, 8, 9, 16, 17, 23, 24, 25, 40)
      (size, stride) <- Seq((8, 8), (8, 6), (8, 3), (5, 5), (40, 10))
    } {
      val text = words.take(n).mkString(" ")
      assert(run(text, size, stride) === bruteChunks(text, size, stride),
        s"n=$n size=$size stride=$stride")
    }
  }

  test("short docs pass through as exactly one unpadded chunk") {
    val out = run("a b c", size = 32, stride = 24)
    assert(out === Seq((0L, 3L, "a b c")))
  }

  test("every token is covered and the last window reaches the end") {
    val text = (1 to 29).map(i => s"t$i").mkString(" ")
    val out = run(text, size = 8, stride = 5)
    val covered = out.flatMap { case (i, len, _) =>
      (i.toInt * 5) until (i.toInt * 5 + len.toInt) }.toSet
    assert(covered === (0 until 29).toSet, "windows must cover all tokens")
    val (lastIdx, lastLen, _) = out.last
    assert(lastIdx.toInt * 5 + lastLen.toInt === 29, "last window ends at n")
    assert(out.init.forall(_._2 === 8L), "only the final window may be short")
  }

  test("invalid configurations fail fast") {
    val df = Seq((0L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.tokenChunks(df, size = 0))
    intercept[IllegalArgumentException](
      Chunker.tokenChunks(df, size = 4, stride = 5))
    intercept[IllegalArgumentException](
      Chunker.tokenChunks(df, size = 4, stride = 0))
  }
}
