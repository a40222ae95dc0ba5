package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer TRAINING — merge-rule induction (Sennrich,
  * Haddow, Birch — "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016). [[graft.functions.TextOps.bpeTokens]] is the apply
  * side's PRE-tokenizer (q46); this is the other half a training-data
  * pipeline needs: learning the merge table itself from the corpus.
  *
  * Scale shape, in order:
  *  1. corpus → word vocabulary with occurrence weights — ONE corpus-wide
  *     aggregation, the only step that ever touches 100 TB; everything
  *     after runs on the vocabulary (≪ corpus: ~10⁷ distinct words for a
  *     web-scale crawl), which is also why weighting by word count is not
  *     an approximation — it IS the corpus pair count.
  *  2. per merge round: adjacent-pair counts over the vocab (one small
  *     aggregation), a TakeOrdered(1) argmax to the driver (the only
  *     driver traffic: ONE row per round), and a narrow fold that applies
  *     the merge to each word's symbol array.
  * Rounds are lineage-truncated like the connected-components loop
  * (eager DISK_ONLY localCheckpoint per round, prior round's blocks
  * released) — numMerges can reach vocabulary scale without the logical
  * plan growing per round.
  *
  * Determinism: the argmax orders by (count DESC, left ASC, right ASC) —
  * a total order over pairs, so the merge table is a pure function of the
  * corpus, at any parallelism.
  */
object BpeTrain {

  /** One learned rule: at `rank` (0-based), adjacent (`left`, `right`)
    * symbols — `count` weighted occurrences at learn time — fuse. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Word vocabulary with occurrence weights — the corpus→vocab
    * reduction (step 1 above). `explode_outer` + null-filter on the
    * generator OUTPUT: the non-outer form triggers
    * InferFiltersFromGenerate, whose inferred scan filter re-evaluates
    * the tokenizer regex per element (the q55 lesson, BASELINE.md). */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode_outer(TextOps.bpeTokens(col(textCol))).as("word"))
      .where(col("word").isNotNull && col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("w"))

  /** `word` (string) → `syms` (array of single-character strings).
    * DOTALL: a pre-token can be a lone control char (the `[^a-z0-9 ]`
    * class matches "\n"), and plain `.` would drop it — giving the
    * distributed trainer an empty symbol array where [[encodeWord]]'s
    * `word.map(_.toString)` keeps the char. */
  def charSyms(word: Column): Column =
    regexp_extract_all(word, lit("(?s)."), lit(0))

  /** Adjacent symbol-pair counts over a (`syms`, `w`) vocabulary,
    * weighted by word occurrence — columns (l, r, cnt). */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val n = size(col("syms"))
    val pairs = zip_with(
      slice(col("syms"), lit(1), n - 1),
      slice(col("syms"), lit(2), n - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
    vocab.where(n >= 2)
      .select(col("w"), explode_outer(pairs).as("p"))
      .where(col("p").isNotNull)
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** One greedy left-to-right merge round over a `syms` array: every
    * non-overlapping adjacent (left, right) becomes left+right. A fold is
    * exactly the greedy scan: a merged element's VALUE is left+right ≠
    * left (symbols are non-empty), so the fold never re-merges an element
    * it just created — "aaa" under (a,a) yields [aa, a], not [aa, aa].
    *
    * The pair arrives as COLUMNS, not literals: the training loop feeds
    * it from a broadcast 1-row frame, so every round compiles to the
    * structurally identical plan and whole-stage codegen's cache serves
    * rounds 2..n — with per-round literals each round generated and
    * JIT-compiled a fresh class, which dominated small-vocab round time. */
  def mergeExpr(syms: Column, left: Column, right: Column): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === left && s === right,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(left, right))))
          .otherwise(concat(acc, array(s))))

  def mergeExpr(syms: Column, left: String, right: String): Column =
    mergeExpr(syms, lit(left), lit(right))

  /** Learn up to `numMerges` merge rules from the corpus. Stops early
    * when the best remaining pair's weighted count drops below
    * `minPairCount` (vocabulary exhausted / noise floor). */
  def trainMerges(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 50,
      minPairCount: Long = 2L): Seq[Merge] =
    trainMergesFromVocab(wordVocab(docs, textCol), numMerges, minPairCount)

  /** Lineage-truncate every this-many merge rounds. Between checkpoints
    * rounds only PERSIST: unlike the CC loop (which references each
    * round's frame twice, doubling the plan per round), a merge round
    * references its predecessor once, so the plan grows LINEARLY and a
    * cache is enough — the argmax job materializes it as a side effect,
    * halving the jobs per round. The periodic checkpoint still bounds
    * plan depth, so numMerges can reach vocabulary scale (thousands)
    * without analyzer-stack or treeString blowup. */
  private val CheckpointEvery = 8

  /** Same, from a prepared (`word`, `w`) vocabulary — lets callers train
    * several tokenizers (per language, per domain) off one corpus pass. */
  def trainMergesFromVocab(
      wordWeights: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges $numMerges must be >= 0")
    require(minPairCount >= 1L, s"minPairCount $minPairCount must be >= 1")
    val merges = Seq.newBuilder[Merge]
    var vocab = wordWeights
      .select(charSyms(col("word")).as("syms"), col("w"))
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    var vocabIsCheckpoint = true
    // a lazily-persisted round still READS its predecessor's blocks when
    // the next argmax first materializes it — the predecessor's release
    // must wait until after that job, or every round would recompute the
    // whole segment since the last checkpoint
    var lagged: Option[(DataFrame, Boolean)] = None
    def release(df: DataFrame, isCheckpoint: Boolean): Unit =
      if (isCheckpoint) org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(df)
      else { df.unpersist(false); () }
    try {
      var rank = 0
      var exhausted = false
      while (rank < numMerges && !exhausted) {
        // TakeOrdered(1): the per-partition heads meet at the driver —
        // one row of traffic, no full sort of the pair frame; this job
        // also materializes the round's lazily-persisted vocab, after
        // which the lagged predecessor has no reader left
        val top = pairCounts(vocab)
          .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
        lagged.foreach { case (df, ck) => release(df, ck) }
        lagged = None
        if (top.isEmpty || top.head.getLong(2) < minPairCount) exhausted = true
        else {
          val (l, r, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
          merges += Merge(rank, l, r, c)
          val checkpointRound = (rank + 1) % CheckpointEvery == 0
          // the round's pair as a broadcast 1-row frame (see mergeExpr:
          // identical plan per round ⇒ codegen cache hit)
          val sess = vocab.sparkSession
          val mrow = sess.createDataFrame(
            java.util.Arrays.asList(org.apache.spark.sql.Row(l, r)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("ml_", org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("mr_", org.apache.spark.sql.types.StringType))))
          val transformed = vocab.crossJoin(broadcast(mrow))
            .withColumn("syms", mergeExpr(col("syms"), col("ml_"), col("mr_")))
            .drop("ml_", "mr_")
          val next =
            if (checkpointRound) transformed.localCheckpoint(true, StorageLevel.DISK_ONLY)
            else transformed.persist(StorageLevel.DISK_ONLY)
          if (checkpointRound) release(vocab, vocabIsCheckpoint) // next is eager
          else lagged = Some((vocab, vocabIsCheckpoint))
          vocab = next
          vocabIsCheckpoint = checkpointRound
          rank += 1
        }
      }
      merges.result()
    } finally {
      // the merge table is the model; the working frames have no further
      // reader on ANY exit path (normal or throwing)
      lagged.foreach { case (df, ck) => release(df, ck) }
      release(vocab, vocabIsCheckpoint)
    }
  }

  // ---- encode (apply a trained merge table) ----

  /** [[mergeExpr]]'s greedy scan, driver-side — shared by the reference
    * encoder and the specs' equivalence checks. */
  def applyMerge(syms: List[String], left: String, right: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == left && b == right =>
          out += left + right; rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
    }
    out.result()
  }

  /** One string per CODE POINT — the driver-side twin of [[charSyms]]
    * (whose `(?s).` regex matches code points). `word.map(_.toString)`
    * would split by UTF-16 code units, cutting every non-BMP char
    * (emoji, astral CJK) into two lone surrogates — symbols the trainer
    * never produced, so trained merges could never match at encode time. */
  def codePointSyms(word: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Segment one pre-token with a trained merge table, applying rules in
    * rank order, one full greedy pass each. For TRAINED tables this
    * equals the priority-queue BPE encoder: a rule's constituent symbols
    * only ever come from strictly earlier-ranked rules (that is how they
    * entered the vocabulary), so a later rule can never create a match
    * for an earlier one — rank order is already priority order.
    *
    * Allocation-lean: array-based with a symbol-presence skip — a rank
    * whose left or right symbol is absent from the word is a no-op pass
    * by definition, and for realistic tables most ranks miss most words,
    * so the common path is one HashSet probe per rank, not a full scan
    * + list rebuild per rank (the q116 contended-box cost). The presence
    * set is an over-approximation (consumed symbols are not evicted) —
    * an extra scan occasionally, never a missed merge. Spec-asserted
    * equal to the reference fold ([[encodeWordNaive]]) on randomized
    * words and tables. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val syms0 = codePointSyms(word)
    if (syms0.lengthCompare(2) < 0 || merges.isEmpty) return syms0
    var out = syms0.toArray
    val present = new java.util.HashSet[String](out.length * 2)
    out.foreach(present.add)
    val it = merges.iterator
    while (it.hasNext && out.length >= 2) {
      val (l, r) = it.next()
      if (present.contains(l) && present.contains(r)) {
        var i = 0
        var w = 0
        val n = out.length
        var merged = false
        while (i < n) {
          if (i + 1 < n && out(i) == l && out(i + 1) == r) {
            val lr = l + r
            out(w) = lr; present.add(lr); i += 2; merged = true
          } else { out(w) = out(i); i += 1 }
          w += 1
        }
        if (merged) out = java.util.Arrays.copyOf(out, w)
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** The direct rank-ordered fold — the spec oracle for [[encodeWord]]
    * and the line-for-line twin of the q116 SQL replay. */
  private[graft] def encodeWordNaive(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(codePointSyms(word)) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }

  /** Per-thread pre-token memo for [[encodeUdf]]: word frequencies are
    * Zipfian, so the same pre-tokens recur constantly within a task and
    * the encode loop re-derives identical segmentations millions of
    * times. Keyed by (merge-table content hash, word) — two UDFs with
    * different tables sharing a thread cannot collide; a static object
    * so nothing non-serializable rides the UDF closure. Size-capped and
    * cleared wholesale on overflow (bounded memory per thread; the
    * Zipf head repopulates in microseconds). */
  private object EncodeCache {
    final val MaxEntries = 1 << 16
    val tl: ThreadLocal[java.util.HashMap[(Long, String), Seq[String]]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[(Long, String), Seq[String]]())
  }

  /** 64-bit content fingerprint of a merge table for the cache key —
    * two independent 32-bit MurmurHash3 passes over an unambiguous
    * flattening (NUL/SOH separators can't appear in trained symbols).
    * A bare `Seq.hashCode` is 32 bits: two distinct tables colliding at
    * ~2⁻³² would silently serve one table's segmentations to the other;
    * at 64 bits the class is gone for any real session. */
  private def tableFingerprint(merges: Seq[(String, String)]): Long = {
    val flat = merges.map { case (l, r) => l + "\u0000" + r }.mkString("\u0001")
    val a = scala.util.hashing.MurmurHash3.stringHash(flat, 0x9747b28c)
    val b = scala.util.hashing.MurmurHash3.stringHash(flat, 0x85ebca6b)
    (a.toLong << 32) | (b.toLong & 0xffffffffL)
  }

  /** text → BPE token array under a trained merge table: pre-tokenize
    * with [[TextOps.BpeTokenPattern]] (the q46 apply side), then segment
    * each pre-token. A Scala UDF, deliberately — the per-word rule loop
    * is iterative with data-dependent trip count; the codegen'd
    * alternative is a numMerges-deep nested HOF expression (SURVEY §2.11
    * places UDFs below native expressions, above everything else). The
    * merge table rides the closure — model state, like the k-means
    * centroids, broadcast once per stage. */
  def encodeUdf(merges: Seq[(String, String)]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val pattern = TextOps.BpeTokenPattern.r
    // content fingerprint computed once, driver-side: the cache key must
    // be stable across the per-task closure deserializations that each
    // get their own Seq instance
    val tableHash = tableFingerprint(merges)
    udf { (text: String) =>
      if (text == null) null
      // Locale.ROOT: default-locale toLowerCase is box-dependent (the
      // Turkish-İ mapping) — this must match Spark's locale-independent
      // lower() used by the q46/q116 train side and the DuckDB oracle
      else {
        val cache = EncodeCache.tl.get()
        pattern.findAllIn(text.toLowerCase(java.util.Locale.ROOT))
          .flatMap { w =>
            val key = (tableHash, w)
            var e = cache.get(key)
            if (e == null) {
              e = encodeWord(w, merges)
              if (cache.size >= EncodeCache.MaxEntries) cache.clear()
              cache.put(key, e)
            }
            e
          }.toSeq
      }
    }
  }

  /** The DuckDB replay of [[trainMerges]], generated from the same round
    * structure (the kCenterSqlCtes / hilbertSqlCtes one-source-of-truth
    * rule — an iterative corpus-level argmax loop unrolls into a CTE
    * chain with one (pair-count, argmax, greedy-merge) block per round).
    * `table` must expose a `text` column; output matches
    * `trainMerges(...).toDF()`: (rank, left, right, count) ordered by
    * rank, early-stop included (a round whose best pair falls below
    * `minPairCount` emits nothing and every later round is empty too —
    * the argmax CTE runs dry exactly where the engine loop breaks).
    *
    * The greedy fold is replayed relationally: match positions i where
    * (syms[i], syms[i+1]) = the round's pair, gaps-and-islands over
    * consecutive matches (only possible when left = right), keep the
    * odd ranks within each island — byte-for-byte the fold's
    * non-overlapping left-to-right selection — then rebuild each word
    * as merged tokens at selected positions + untouched symbols
    * anti-joined against the covered set. CTEs are MATERIALIZED: the
    * inlined form re-evaluates v₀ per reference (and re-opens the
    * parquet until the fd limit), the materialized chain runs each
    * round once. */
  def mergesSqlCtes(table: String, numMerges: Int, minPairCount: Long = 2L): String = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges $numMerges outside [1, 64]")
    require(minPairCount >= 1L, s"minPairCount $minPairCount must be >= 1")
    val ctes = Seq.newBuilder[String]
    ctes += s"""wv AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM (SELECT unnest(regexp_extract_all(lower(text),
      |          '${TextOps.BpeTokenPattern}')) AS word FROM $table)
      |  WHERE word <> '' GROUP BY word)""".stripMargin
    ctes += """v0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY word) AS wid,
      |  string_split(word, '') AS syms, w FROM wv)""".stripMargin
    for (r <- 0 until numMerges) {
      ctes += s"""pc$r AS (SELECT syms[i] AS lc, syms[i+1] AS rc,
        |    CAST(SUM(w) AS BIGINT) AS cnt
        |  FROM v$r, unnest(generate_series(1, len(syms)-1)) AS u(i)
        |  GROUP BY 1, 2)""".stripMargin
      ctes += s"""a$r AS MATERIALIZED (SELECT lc, rc, cnt FROM pc$r
        |  WHERE cnt >= $minPairCount ORDER BY cnt DESC, lc, rc LIMIT 1)""".stripMargin
      ctes += s"""m$r AS (SELECT wid, i
        |  FROM v$r, a$r, unnest(generate_series(1, len(syms)-1)) AS u(i)
        |  WHERE syms[i] = lc AND syms[i+1] = rc)""".stripMargin
      ctes += s"""sel$r AS MATERIALIZED (SELECT wid, i FROM (
        |    SELECT wid, i, ROW_NUMBER() OVER (PARTITION BY wid, g ORDER BY i) AS rn
        |    FROM (SELECT wid, i,
        |            i - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY i) AS g
        |          FROM m$r))
        |  WHERE rn % 2 = 1)""".stripMargin
      ctes += s"""cov$r AS (SELECT wid, i AS pos FROM sel$r
        |  UNION ALL SELECT wid, i + 1 FROM sel$r)""".stripMargin
      ctes += s"""v${r + 1} AS MATERIALIZED (SELECT wid,
        |    list(tok ORDER BY pos) AS syms, any_value(w) AS w FROM (
        |    SELECT v.wid, s.i AS pos, v.syms[s.i] || v.syms[s.i+1] AS tok, v.w
        |      FROM v$r v JOIN sel$r s USING (wid)
        |    UNION ALL
        |    SELECT p.wid, p.pos, p.tok, p.w FROM (
        |      SELECT v.wid, u.i AS pos, v.syms[u.i] AS tok, v.w
        |        FROM v$r v, unnest(generate_series(1, len(v.syms))) AS u(i)) p
        |      ANTI JOIN cov$r c ON p.wid = c.wid AND p.pos = c.pos
        |  ) GROUP BY wid)""".stripMargin
    }
    val finals = (0 until numMerges).map(r =>
      s"""SELECT CAST($r AS INTEGER) AS rank, lc AS "left", rc AS "right",
         |  cnt AS "count" FROM a$r""".stripMargin)
      .mkString("\nUNION ALL ")
    s"WITH ${ctes.result().mkString(",\n")}\n$finals\nORDER BY rank"
  }
}
