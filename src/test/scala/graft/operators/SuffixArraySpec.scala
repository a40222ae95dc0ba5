package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[SuffixArray]] gates: the prefix-doubling rank order equals a
  * sequential direct suffix sort on randomized corpora (the same
  * two-algorithms-one-answer contract the q216 oracle enforces
  * cross-engine), byte-equal suffixes across documents share one rank,
  * [[SuffixArray.longestRepeats]] recovers a planted repeat exactly, and
  * the result is invariant to input partitioning. */
class SuffixArraySpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  /** Direct reference: sort all (id, pos) suffixes lexicographically with
    * the (id, pos) tiebreak; dense rank = index of the suffix STRING in
    * the sorted distinct-suffix list. */
  private def refRanks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for ((id, txt) <- docs; p <- 1 to txt.length)
      yield ((id, p.toLong), txt.substring(p - 1))
    val distinctSorted = sfx.map(_._2).distinct.sorted
    val rank = distinctSorted.zipWithIndex.toMap
    sfx.map { case (k, s) => k -> rank(s).toLong }.toMap
  }

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randomDocs(seed: Long, nDocs: Int, maxLen: Int,
      alphabet: String = "abcab"): Seq[(Long, String)] = {
    val r = rng(seed)
    (0L until nDocs).map { id =>
      val len = 1 + r.nextInt(maxLen)
      id -> Seq.fill(len)(alphabet(r.nextInt(alphabet.length))).mkString
    }
  }

  private def engineRanks(docs: Seq[(Long, String)], parts: Int = 4,
      seedLen: Int = 8): Map[(Long, Long), Long] = {
    val df = docs.toDF("doc_id", "text").repartition(parts)
    val out = SuffixArray.suffixRanks(df, seedLen = seedLen)
    try out.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    finally org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(out)
  }

  test("suffixRanks equals the direct suffix sort on randomized small-alphabet corpora") {
    // small alphabet forces deep shared prefixes -> many doubling rounds
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = randomDocs(seed, nDocs = 6, maxLen = 40)
      assert(engineRanks(docs) === refRanks(docs), s"seed=$seed")
    }
  }

  test("suffixRanks: byte-equal suffixes across documents share one dense rank") {
    val docs = Seq(1L -> "xyzzy", 2L -> "zzy", 3L -> "azzy")
    val got = engineRanks(docs)
    assert(got === refRanks(docs))
    // "zzy" occurs as doc1 pos 3, doc2 pos 1; "y" as doc1@5/doc2@3/doc3@4
    assert(got((1L, 3L)) === got((2L, 1L)))
    assert(got((1L, 5L)) === got((2L, 3L)))
    assert(got((2L, 3L)) === got((3L, 4L)))
  }

  test("suffixRanks: one document a strict prefix of another (the q216 fixture shape)") {
    // doc 2 is a strict prefix of doc 1: every doc-2 suffix is a proper
    // prefix of the matching doc-1 suffix and must rank strictly BEFORE it
    val docs = Seq(1L -> "abcdef", 2L -> "abcd")
    val got = engineRanks(docs)
    assert(got === refRanks(docs))
    assert(got((2L, 1L)) < got((1L, 1L)))
    assert(got((2L, 2L)) < got((1L, 2L)))
  }

  test("suffixRanks: seedLen 1 (maximum rounds) matches seedLen 8 and the reference") {
    val docs = randomDocs(7L, nDocs = 4, maxLen = 30, alphabet = "ab")
    val ref = refRanks(docs)
    assert(engineRanks(docs, seedLen = 1) === ref)
    assert(engineRanks(docs, seedLen = 8) === ref)
  }

  test("suffixRanks is invariant to input partitioning") {
    val docs = randomDocs(11L, nDocs = 5, maxLen = 25)
    assert(engineRanks(docs, parts = 1) === engineRanks(docs, parts = 7))
  }

  test("longestRepeats recovers a planted cross-document repeat, longest first") {
    val planted = "the quick brown fox jumps over the lazy dog"
    // both the plant's PRECEDING char (X vs Y) and its continuation
    // (B vs D) diverge immediately, so the expected LCP is exactly the
    // planted length — no boundary overlap on either side
    val docs = Seq(
      1L -> s"X${planted}B",
      2L -> s"Y${planted}D",
      3L -> "nothing shared here at all qq")
    val out = SuffixArray.longestRepeats(docs.toDF("doc_id", "text"),
      lcpCap = 64, minLen = planted.length, topK = 5).collect()
    // exactly the adjacent pair(s) carrying the planted string survive minLen
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getLong(0) === planted.length.toLong)
    assert(top.getString(1) === planted)
    val pair = Set(top.getLong(2), top.getLong(4))
    assert(pair === Set(1L, 2L))
  }

  test("longestRepeats: overlapping within-doc repeat (periodic string) is found") {
    // "abab...ab": suffix 1 and suffix 3 share a prefix of len-2 chars
    val txt = "ab" * 12
    val out = SuffixArray.longestRepeats(Seq(9L -> txt).toDF("doc_id", "text"),
      lcpCap = 64, minLen = 4, topK = 3).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) === (txt.length - 2).toLong)
  }

  test("longestRepeats: minLen above every LCP yields an empty frame with the declared schema") {
    val out = SuffixArray.longestRepeats(
      Seq(1L -> "abcdefg", 2L -> "hijklmn").toDF("doc_id", "text"),
      lcpCap = 32, minLen = 30, topK = 5)
    assert(out.columns.toSeq ===
      Seq("lcp", "rep", "a_doc", "a_pos", "b_doc", "b_pos"))
    assert(out.count() === 0L)
  }

  test("lcpExpr: exact common-prefix length, cap and length bounds") {
    val df = Seq(
      ("abcdef", "abcxyz"), // lcp 3
      ("same", "same"),     // lcp 4 (full, below cap)
      ("", "anything"),     // lcp 0
      ("ax", "bx")          // lcp 0 (first char differs)
    ).toDF("a", "b")
    val got = df.select(SuffixArray.lcpExpr("a", "b", 5)).as[Long].collect().toSeq
    assert(got === Seq(3L, 4L, 0L, 0L))
    // cap clamps a longer agreement
    val capped = Seq(("zzzzzzzz", "zzzzzzzz")).toDF("a", "b")
      .select(SuffixArray.lcpExpr("a", "b", 5)).as[Long].head()
    assert(capped === 5L)
  }
}
