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
  * Determinism + cross-engine replay (the q217 exact-integer rule,
  * applied r14): per-piece scores are QUANTIZED to micro-nats —
  * round(ln(max(c, 0.5)/total)·10⁶) as int64, computed once on the
  * driver — so every Viterbi path sum is an EXACT integer addition and
  * ties break on (higher score, then LONGER piece) identically in any
  * engine. This is what makes the whole trainer SQL-replayable (q205's
  * generated oracle, [[trainSqlCtes]]): double log-prob path sums have
  * ulp-level near-ties that libm differences can flip; integer sums
  * cannot. The one remaining double op, ln itself, is quantized at 10⁻⁶
  * where a 1-ulp libm disagreement (≈2·10⁻⁹ relative) cannot move the
  * rounded value except on an exact .5 boundary a transcendental never
  * hits. Counts are exact longs; probabilities divide exact counts
  * once, on the driver. */
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

  /** Quantize a log-prob to micro-nats: round(x·10⁶) as int64 — THE
    * score currency of the trainer and its SQL replay (floor(x+0.5),
    * `math.round`'s exact definition, mirrored as FLOOR(x·1e6 + 0.5) in
    * the generated oracle). */
  def microNats(logProb: Double): Long = math.round(logProb * 1e6)

  /** Viterbi best segmentation of `word` under `lp` (piece → micro-nat
    * score, [[microNats]]). Pieces limited to `maxLen`; characters
    * absent from `lp` fall back to `unkScore` as single-char pieces
    * (encode-time robustness — during training every corpus char is in
    * the inventory). Ties prefer the LONGER final piece (deterministic —
    * and with integer scores, ties are EXACT in every engine, never
    * ulp-dependent). Path sums cannot overflow: |score| ≤ ~10⁸ micro-
    * nats and words are bounded by the pre-tokenizer. */
  def viterbi(word: String, lp: Map[String, Long], maxLen: Int,
      unkScore: Long = -20000000L): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = new Array[Long](n + 1)
    val bLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxLen, j)
      while (l <= lMax) {
        if (best(j - l) != Long.MinValue) {
          val piece = word.substring(j - l, j)
          val w = lp.get(piece) match {
            case Some(x) => x
            case None => if (l == 1) unkScore else Long.MinValue
          }
          if (w != Long.MinValue) {
            val cand = best(j - l) + w
            // >= : later (longer) l wins exact ties (any finite cand
            // beats the Long.MinValue init)
            if (cand >= best(j)) { best(j) = cand; bLen(j) = l }
          }
        }
        l += 1
      }
      j += 1
    }
    // every position reachable: single chars always score (lp or unk);
    // a caller-supplied map using Long.MinValue as a hand-rolled −∞
    // would break the invariant — fail loud instead of spinning on a
    // zero-length backtrack step
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = bLen(p)
      require(l > 0,
        s"viterbi: position $p of '$word' unreachable — a piece in lp " +
          "scores Long.MinValue (the -Infinity sentinel); use a finite " +
          "floored score instead")
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
        // bLen = 0 (the fail-loud guard there is the second fence).
        // Scores quantize to micro-nat int64 so every path sum is exact
        // and the DP replays bit-identically in the SQL oracle.
        val lp = pieces.map { case (p, c) =>
          p -> microNats(math.log((c.toDouble max 0.5) / total)) }.toMap
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

  /** The DuckDB replay of [[train]] + [[vocabTable]], generated from the
    * same parameters (the one-source-of-truth rule of kCenterSqlCtes /
    * mergesSqlCtes / lpaSqlCtes) — the q205 oracle. Structure, one block
    * per EM round over the shared word-vocabulary frame:
    *
    *   - `lp{i}`: micro-nat scores FLOOR(ln(max(c,0.5)/total)·1e6 + 0.5)
    *     — `math.round`'s exact definition, so both engines hold the
    *     same int64 score table;
    *   - `fwd{i}`: the per-word Viterbi forward DP as a RECURSIVE CTE
    *     over consumed-prefix length j, carrying a sliding window of the
    *     last `maxPieceLen` best scores (a recursive CTE sees only the
    *     previous iteration's rows — the window IS the DP frontier);
    *   - `bk{i}`: the backtrack as a second recursive CTE from j =
    *     len(word) down, re-deriving the argmax with the LONGEST-piece
    *     tie-break as a CASE cascade over exact integer equalities;
    *   - `cnt{i+1}`/`p{i+1}`: the weighted piece counts and the M-step
    *     filter (count > 0 OR single char).
    *
    * Reused frames are AS MATERIALIZED: DuckDB inlines plain CTEs per
    * reference, and the p0→p1→…→p{iters} chain would otherwise expand
    * the corpus scan exponentially. Recursion depth = max word length
    * (pre-tokenizer-bounded), rows per level = vocabulary-sized. */
  def trainSqlCtes(
      table: String,
      seedSize: Int,
      maxPieceLen: Int,
      iters: Int,
      vocabSize: Int): String = {
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen $maxPieceLen outside [2, 16]")
    require(iters >= 1 && iters <= 20, s"iters $iters outside [1, 20]")
    val NEG = "CAST(-4611686018427387904 AS BIGINT)" // << any real path sum
    def iterBlock(i: Int): Seq[String] = {
      val lp = s"lp$i AS MATERIALIZED (SELECT piece, " +
        "CAST(FLOOR(ln(GREATEST(CAST(cnt AS DOUBLE), 0.5) / " +
        s"(SELECT CAST(SUM(cnt) AS DOUBLE) FROM p$i)) * 1000000 + 0.5) " +
        s"AS BIGINT) AS q FROM p$i)"
      val bcols = (1 until maxPieceLen)
        .map(k => s"CAST(NULL AS BIGINT) AS b$k").mkString(", ")
      val joins = (1 to maxPieceLen).map { l =>
        val sub = s"substring(f.word, f.j + ${2 - l}, $l)"
        if (l == 1) s"JOIN lp$i q$l ON q$l.piece = $sub"
        else s"LEFT JOIN lp$i q$l ON f.j >= ${l - 1} AND q$l.piece = $sub"
      }
      val cands = (1 to maxPieceLen).map { l =>
        if (l == 1) s"f.b0 + q$l.q"
        else s"COALESCE(f.b${l - 1} + q$l.q, $NEG)"
      }
      val shift = (0 until maxPieceLen - 1).map(k => s"f.b$k").mkString(", ")
      val fwd =
        s"""fwd$i AS (
           |  SELECT word, 0 AS j, CAST(0 AS BIGINT) AS b0, $bcols FROM wv
           |  UNION ALL
           |  SELECT f.word, f.j + 1, GREATEST(${cands.mkString(", ")}), $shift
           |  FROM fwd$i f
           |  ${joins.mkString("\n  ")}
           |  WHERE f.j < length(f.word))""".stripMargin
      val bst = s"bst$i AS MATERIALIZED (SELECT word, j, b0 AS b FROM fwd$i)"
      val bjoins = (1 to maxPieceLen).flatMap { l =>
        Seq(s"LEFT JOIN bst$i m$l ON m$l.word = f.word AND m$l.j = f.j - $l",
          s"LEFT JOIN lp$i r$l ON r$l.piece = substring(f.word, f.j + ${1 - l}, $l)")
      }
      def cond(l: Int) = s"(f.j >= $l AND m$l.b IS NOT NULL AND " +
        s"r$l.q IS NOT NULL AND m$l.b + r$l.q = bj.b)"
      val lpick = (maxPieceLen to 2 by -1)
        .map(l => s"WHEN ${cond(l)} THEN $l").mkString(" ")
      val ppick = (maxPieceLen to 2 by -1)
        .map(l => s"WHEN ${cond(l)} THEN substring(f.word, f.j + ${1 - l}, $l)")
        .mkString(" ")
      val bk =
        s"""bk$i AS (
           |  SELECT word, length(word) AS j, CAST(NULL AS VARCHAR) AS piece FROM wv
           |  UNION ALL
           |  SELECT f.word,
           |    f.j - (CASE $lpick ELSE 1 END),
           |    CASE $ppick ELSE substring(f.word, f.j, 1) END
           |  FROM bk$i f
           |  JOIN bst$i bj ON bj.word = f.word AND bj.j = f.j
           |  ${bjoins.mkString("\n  ")}
           |  WHERE f.j > 0)""".stripMargin
      val cnt = s"cnt${i + 1} AS MATERIALIZED (SELECT b.piece, " +
        "CAST(SUM(v.w) AS BIGINT) AS cnt " +
        s"FROM bk$i b JOIN wv v ON v.word = b.word " +
        "WHERE b.piece IS NOT NULL GROUP BY 1)"
      val pnext = s"p${i + 1} AS MATERIALIZED (SELECT p.piece, " +
        "COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt " +
        s"FROM p$i p LEFT JOIN cnt${i + 1} c ON c.piece = p.piece " +
        "WHERE COALESCE(c.cnt, 0) > 0 OR length(p.piece) = 1)"
      Seq(lp, fwd, bst, bk, cnt, pnext)
    }
    val head = Seq(
      s"""wds AS (SELECT unnest(regexp_extract_all(lower(text),
         |  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word FROM $table)""".stripMargin,
      "wv AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS w " +
        "FROM wds WHERE word <> '' GROUP BY word)",
      "px AS MATERIALIZED (SELECT word, w, " +
        "unnest(generate_series(1, length(word))) AS i FROM wv)",
      s"""ps AS (SELECT substring(word, i, l) AS piece, w
         |  FROM (SELECT word, w, i, unnest(generate_series(1,
         |    least($maxPieceLen, length(word) - i + 1))) AS l FROM px))""".stripMargin,
      s"""seed AS (SELECT piece, CAST(SUM(w) AS BIGINT) AS cnt FROM ps
         |  GROUP BY 1 ORDER BY cnt DESC, piece LIMIT $seedSize)""".stripMargin,
      "chars AS (SELECT DISTINCT substring(word, i, 1) AS piece FROM px)",
      s"""p0 AS MATERIALIZED (SELECT piece, cnt FROM seed
         |  UNION ALL SELECT c.piece, CAST(1 AS BIGINT) FROM chars c
         |  WHERE c.piece NOT IN (SELECT piece FROM seed))""".stripMargin)
    val tail = Seq(
      s"""sel AS (SELECT piece, cnt,
         |  ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn FROM p$iters)""".stripMargin,
      s"keep AS (SELECT piece, cnt FROM sel WHERE rn <= $vocabSize " +
        "OR length(piece) = 1)")
    val ctes = head ++ (0 until iters).flatMap(iterBlock) ++ tail
    s"""WITH RECURSIVE ${ctes.mkString(",\n")}
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS BIGINT) AS rank,
       |  piece, cnt,
       |  ROUND(ln(GREATEST(CAST(cnt AS DOUBLE), 0.5)
       |    / (SELECT GREATEST(CAST(SUM(cnt) AS DOUBLE), 1.0) FROM keep)), 6) AS logprob
       |FROM keep ORDER BY rank""".stripMargin
  }

  /** Encode UDF over the trained model: text pre-tokenizes with the
    * BPE-family regex, each word Viterbi-segments under the final piece
    * probabilities (quantized to the trainer's micro-nat currency, so
    * encode ties resolve exactly like training ties). */
  def encodeUdf(m: Model): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val lp = m.logProbs.map { case (p, x) => p -> microNats(x) }
    val mpl = m.maxPieceLen
    val pattern = graft.functions.TextOps.BpeTokenPattern.r
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else pattern.findAllIn(text.toLowerCase(java.util.Locale.ROOT))
        .flatMap(w => viterbi(w, lp, mpl)).toArray
    }
  }
}
