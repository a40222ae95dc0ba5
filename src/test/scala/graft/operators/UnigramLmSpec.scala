package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpecBase {

  // ---- sequential reference: same algorithm, no Spark ----------------
  private def refViterbi(word: String, lp: Map[String, Long],
      maxLen: Int): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val n = word.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val bl = new Array[Int](n + 1)
    best(0) = 0L
    for (j <- 1 to n; l <- 1 to math.min(maxLen, j)) {
      val piece = word.substring(j - l, j)
      val w = lp.getOrElse(piece,
        if (l == 1) -20000000L else Long.MinValue)
      if (w != Long.MinValue && best(j - l) != Long.MinValue) {
        val c = best(j - l) + w
        if (c >= best(j)) { best(j) = c; bl(j) = l }
      }
    }
    var p = n
    var acc = List.empty[String]
    while (p > 0) { acc = word.substring(p - bl(p), p) :: acc; p -= bl(p) }
    acc
  }

  private def refTrain(words: Seq[(String, Long)], seedSize: Int,
      maxPieceLen: Int, iters: Int): Map[String, Long] = {
    val subs = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + c
    val seeds = subs.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val singles = words.flatMap(_._1.map(_.toString)).distinct
      .filterNot(seeds.map(_._1).contains).map(_ -> 1L)
    var pieces = seeds ++ singles
    for (_ <- 1 to iters) {
      val total = pieces.map(_._2).sum.toDouble
      // mirrors train()'s 0.5 floor and micro-nat quantization: scores
      // are exact int64 so every path-sum comparison is ulp-proof
      val lp = pieces.map { case (p, c) =>
        p -> UnigramLm.microNats(math.log((c.toDouble max 0.5) / total)) }.toMap
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words; piece <- refViterbi(w, lp, maxPieceLen))
        counts(piece) = counts.getOrElse(piece, 0L) + c
      pieces = pieces.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
        .filter { case (p, c) => c > 0 || p.length == 1 }
    }
    pieces.toMap
  }

  private def q(prob: Double): Long = UnigramLm.microNats(math.log(prob))

  test("viterbi: picks the higher-likelihood segmentation, not greedy") {
    // "abc" as one piece scores log(0.5); greedy-left "ab"+"c" scores
    // log(0.25)+log(0.1) — the DP must pick the whole piece
    val lp = Map("abc" -> q(0.5), "ab" -> q(0.25),
      "c" -> q(0.1), "a" -> q(0.1), "b" -> q(0.05))
    assert(UnigramLm.viterbi("abc", lp, 4) === Seq("abc"))
    // ...and when the product of small pieces wins, it splits
    val lp2 = Map("abc" -> q(0.01), "ab" -> q(0.5),
      "c" -> q(0.4), "a" -> q(0.01), "b" -> q(0.01))
    assert(UnigramLm.viterbi("abc", lp2, 4) === Seq("ab", "c"))
  }

  test("viterbi: exact ties prefer the longer piece; unknown chars fall back") {
    // micro-nat quantization preserves this tie EXACTLY: log(.25) is
    // 2·log(.5) in doubles (0.25 = 0.5², doubling exact) and rounding
    // commutes here — q(.25) = 2·q(.5)
    val lp = Map("aa" -> q(0.25), "a" -> q(0.5))
    assert(q(0.25) === 2L * q(0.5), "the planted tie must survive quantization")
    // "aa" one piece = q(.25); "a"+"a" = 2·q(.5) — exact tie -> longer
    assert(UnigramLm.viterbi("aa", lp, 4) === Seq("aa"))
    assert(UnigramLm.viterbi("axa", lp, 4) === Seq("a", "x", "a"),
      "x absent from the inventory segments as an unk single char")
    assert(UnigramLm.viterbi("", lp, 4) === Seq.empty)
  }

  test("viterbi: a MinValue (-Infinity sentinel) piece fails loud in the backtrack") {
    // "b" IS in the inventory (so no unk fallback) but at the -Inf
    // sentinel: every path through "b" is skipped, position 2 of "aba"
    // ends unreachable and position 3 ends with bLen = 0 — the guard
    // fails loud where a pre-guard backtrack spun forever on p -= 0
    val lp = Map("a" -> q(0.5), "b" -> Long.MinValue)
    val e = intercept[IllegalArgumentException] {
      UnigramLm.viterbi("aba", lp, 4)
    }
    assert(e.getMessage.contains("unreachable"))
    // train() floors per-iteration counts, so zero-count singles kept by
    // the M-step never produce the -Inf entry in the first place
    val s = spark
    import s.implicits._
    val docs = Seq("aa aa ab", "aa ab bb").toDF("text")
    val m = UnigramLm.train(docs, seedSize = 16, maxPieceLen = 2,
      iters = 3, vocabSize = 16)
    assert(m.pieces.forall { case (_, _, l) => !l.isInfinite })
  }

  test("train equals the sequential reference on a small corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "ingest the data ingest the rows",
      "ingest data rows rows",
      "the data the data ingest").toDF("text")
    val words = BpeTrain.wordVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = UnigramLm.train(docs, seedSize = 64, maxPieceLen = 4,
      iters = 3, vocabSize = 32)
    val ref = refTrain(words, seedSize = 64, maxPieceLen = 4, iters = 3)
    val gotCounts = got.pieces.map(p => p._1 -> p._2).toMap
    // every kept piece must carry the reference's exact Viterbi count
    gotCounts.foreach { case (p, c) =>
      assert(ref.getOrElse(p, 0L) === c, s"piece '$p'") }
    assert(gotCounts.nonEmpty)
  }

  test("planted frequent substring survives training with a top rank") {
    val s = spark
    import s.implicits._
    val docs = (1 to 40).map(i => s"xingesty$i zingestw$i ingest")
      .toDF("text")
    val m = UnigramLm.train(docs, seedSize = 128, maxPieceLen = 6,
      iters = 3, vocabSize = 64)
    val rankOf = m.pieces.map(_._1).zipWithIndex.toMap
    assert(rankOf.contains("ingest"),
      s"'ingest' must survive; kept=${m.pieces.take(10).map(_._1)}")
    assert(rankOf("ingest") < 10, s"rank ${rankOf("ingest")}")
  }

  test("encode round-trips: pieces concatenate back to the lowered pre-tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq("merge sort scan table", "fast merge table scan")
      .toDF("text")
    val m = UnigramLm.train(docs, seedSize = 64, maxPieceLen = 4,
      iters = 2, vocabSize = 32)
    val enc = UnigramLm.encodeUdf(m)
    val out = docs.select(concat_ws("", enc(col("text"))).as("joined"),
        regexp_replace(lower(col("text")), " ", "").as("want"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("train is partition-invariant; parameter validation fails fast") {
    val s = spark
    import s.implicits._
    val base = (1 to 60).map(i => s"alpha beta gamma delta$i word$i")
    def run(np: Int, rev: Boolean) = {
      val d = (if (rev) base.reverse else base).toDF("text").repartition(np)
      UnigramLm.train(d, seedSize = 64, maxPieceLen = 4, iters = 2,
        vocabSize = 32).pieces.mkString("|")
    }
    assert(run(1, rev = false) === run(16, rev = true))
    intercept[IllegalArgumentException](
      UnigramLm.train(base.toDF("text"), seedSize = 8))
    intercept[IllegalArgumentException](
      UnigramLm.train(base.toDF("text"), vocabSize = 9999))
  }
}
