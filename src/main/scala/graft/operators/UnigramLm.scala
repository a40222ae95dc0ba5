package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization"; the SentencePiece default) — the OTHER production
  * tokenizer family next to BPE (L24): instead of greedily growing
  * merges, start from a LARGE candidate piece inventory and fit piece
  * probabilities so each word's best segmentation maximizes likelihood,
  * then keep the strongest pieces.
  *
  * Deliberate simplifications (documented, spec-pinned):
  *   - hard-EM (Viterbi counts) instead of full forward–backward
  *     expected counts — the classic "Viterbi training" variant; the
  *     E-step assigns each word its single best segmentation;
  *   - seed inventory = the `seedSize` most frequent substrings of
  *     length ≤ `maxPieceLen` (count-weighted, ties piece-ASC) plus ALL
  *     single characters, instead of SentencePiece's suffix-array
  *     selection — same inventory shape, simpler selection;
  *   - pruning keeps the `vocabSize` best pieces by Viterbi count after
  *     the final iteration (single characters always retained — every
  *     word must stay segmentable), instead of likelihood-loss ranking.
  *
  * Distribution shape (the L24/BPE loop discipline): the corpus touches
  * ONE aggregation (word vocabulary); every EM iteration runs over the
  * DISTINCT-WORD frame (vocabulary-sized, not corpus-sized) against a
  * BROADCAST piece table; the per-iteration Viterbi-count aggregation
  * collects a model-sized result (≤ seedSize rows) to the driver, which
  * recomputes log-probabilities — bounded driver state, identical to the
  * BPE trainer's 1-row argmax contract at larger width.
  *
  * Determinism: Viterbi ties break on (higher score, then LONGER piece);
  * scores are doubles computed from one driver-built broadcast map, so
  * every partition sees bit-identical log-probs and the DP is
  * partition-order-proof. Counts are exact longs; probabilities divide
  * exact counts once, on the driver. */
object UnigramLm {

  /** Trained model: pieces with Viterbi counts and log-probs, ranked by
    * (count DESC, piece ASC). */
  final case class Model(pieces: Seq[(String, Long, Double)], maxPieceLen: Int) {
    def logProbs: Map[String, Double] =
      pieces.map(p => p._1 -> p._3).toMap
  }

  /** All substrings of length ≤ maxPieceLen of each vocabulary word,
    * weighted by word count — the candidate inventory (and q206's
    * SQL-replayable twin surface). Output: (piece, cnt). */
  def seedCandidates(wordVocab: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen $maxPieceLen outside [2, 16]")
    // substring with position/length driven by the lambda variables has
    // no typed-DSL form — the HOF chain is authored as a SQL expression
    wordVocab
      .select(col("word"), col("w"),
        expr(s"""flatten(transform(sequence(1, length(word)),
          i -> transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
            l -> substring(word, i, l))))""").as("ps"))
      .select(explode(col("ps")).as("piece"), col("w"))
      .groupBy("piece").agg(sum(col("w")).as("cnt"))
  }

  /** Viterbi best segmentation of `word` under `lp` (piece → log-prob).
    * Pieces limited to `maxLen`; characters absent from `lp` fall back
    * to `unkLogProb` as single-char pieces (encode-time robustness —
    * during training every corpus char is in the inventory). Ties prefer
    * the LONGER final piece (deterministic, no score epsilon). */
  def viterbi(word: String, lp: Map[String, Double], maxLen: Int,
      unkLogProb: Double = -20.0): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = new Array[Double](n + 1)
    val bLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxLen, j)
      while (l <= lMax) {
        if (best(j - l) != Double.NegativeInfinity) {
          val piece = word.substring(j - l, j)
          val w = lp.get(piece) match {
            case Some(x) => x
            case None => if (l == 1) unkLogProb else Double.NaN
          }
          if (!w.isNaN) {
            val cand = best(j - l) + w
            // >= : later (longer) l wins exact ties
            if (cand >= best(j)) { best(j) = cand; bLen(j) = l }
          }
        }
        l += 1
      }
      j += 1
    }
    // every position reachable: single chars always score (lp or unk),
    // and train() floors per-iteration counts so no lp entry is −∞; a
    // caller-supplied map that still breaks the invariant fails loud
    // here instead of spinning on a zero-length backtrack step
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = bLen(p)
      require(l > 0,
        s"viterbi: position $p of '$word' unreachable — a piece in lp " +
          "scores -Infinity; floor its probability instead")
      out.prepend(word.substring(p - l, p))
      p -= l
    }
    out.toList
  }

  /** Train on a corpus: one corpus-touching word-count aggregation, then
    * `iters` rounds of distributed Viterbi counting over the distinct-
    * word frame. Returns the ranked piece model. */
  def train(
      docs: DataFrame,
      textCol: String = "text",
      seedSize: Int = 512,
      maxPieceLen: Int = 4,
      iters: Int = 3,
      vocabSize: Int = 256): Model = {
    require(seedSize >= 16, s"seedSize $seedSize too small")
    require(iters >= 1 && iters <= 20, s"iters $iters outside [1, 20]")
    require(vocabSize >= 16 && vocabSize <= seedSize,
      s"vocabSize $vocabSize outside [16, seedSize]")
    val spark = docs.sparkSession
    val vocab = BpeTrain.wordVocab(docs, textCol).persist()
    try {
      val seeds = seedCandidates(vocab, maxPieceLen)
        .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // single chars always present: substrings of length 1 are seeds by
      // construction only if they made the cut — force-union the rest
      val singles = seeds.filter(_._1.length == 1).map(_._1).toSet
      val allSingles = vocab.select(
          explode(BpeTrain.charSyms(col("word"))).as("c"))
        .groupBy("c").agg(count(lit(1)).as("n"))
        .collect().map(_.getString(0)).toSet
      val forced = (allSingles -- singles).map(c => (c, 1L))
      var pieces: Seq[(String, Long)] = (seeds ++ forced).toSeq
      var counted: Map[String, Long] = pieces.toMap
      for (_ <- 1 to iters) {
        val total = pieces.map(_._2).sum.toDouble
        // 0.5-floor (same as the final model): a zero-count single kept
        // by the M-step filter must carry a FINITE log-prob — log(0)
        // = −∞ would make positions reachable only through it
        // unreachable-but-marked, and viterbi's backtrack would spin on
        // bLen = 0 (the fail-loud guard there is the second fence)
        val lp = pieces.map { case (p, c) =>
          p -> math.log((c.toDouble max 0.5) / total) }.toMap
        val bc = spark.sparkContext.broadcast(lp)
        val mpl = maxPieceLen
        val segUdf = udf { (word: String) =>
          viterbi(word, bc.value, mpl).toArray }
        counted = vocab
          .select(explode(segUdf(col("word"))).as("piece"),
            col("w").cast(LongType).as("w"))
          .groupBy("piece").agg(sum(col("w")).as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // E-step used lp's inventory; M-step keeps used pieces + singles
        pieces = pieces.map { case (p, _) => (p, counted.getOrElse(p, 0L)) }
          .filter { case (p, c) => c > 0 || p.length == 1 }
        bc.unpersist()
      }
      val kept = pieces
        .sortBy { case (p, c) => (-c, p) }
        .zipWithIndex
        .filter { case ((p, _), i) => i < vocabSize || p.length == 1 }
        .map(_._1)
      val total = kept.map(_._2).sum.toDouble max 1.0
      Model(
        kept.sortBy { case (p, c) => (-c, p) }
          .map { case (p, c) =>
            (p, c, math.log((c.toDouble max 0.5) / total)) },
        maxPieceLen)
    } finally vocab.unpersist()
  }

  /** The trained vocabulary as a DataFrame: (rank, piece, cnt, logprob
    * rounded to 6) — rank by (cnt DESC, piece ASC). */
  def vocabTable(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.pieces.zipWithIndex
      .map { case ((p, c, l), i) =>
        (i + 1L, p, c, BigDecimal(l).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("rank", "piece", "cnt", "logprob")
  }

  /** Encode UDF over the trained model: text pre-tokenizes with the
    * BPE-family regex, each word Viterbi-segments under the final piece
    * probabilities. */
  def encodeUdf(m: Model): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val lp = m.logProbs
    val mpl = m.maxPieceLen
    val pattern = graft.functions.TextOps.BpeTokenPattern.r
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else pattern.findAllIn(text.toLowerCase(java.util.Locale.ROOT))
        .flatMap(w => viterbi(w, lp, mpl)).toArray
    }
  }
}
