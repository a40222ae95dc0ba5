package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed suffix array over a document corpus — the EXACT any-length
  * repeated-substring machinery that the fixed-n window family
  * ([[Dedup.duplicatedSpanStats]] / [[Dedup.removeDuplicatedSpans]])
  * approximates with one shingle width. A suffix array orders every
  * (doc, pos) character suffix lexicographically; the longest common
  * prefix (LCP) of ADJACENT suffixes in that order surfaces every maximal
  * repeated substring in the corpus at once (Manber & Myers 1990), which
  * is how Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better") find the exact duplicated spans their dedup cuts.
  *
  * Construction is prefix QUADRUPLING (Manber–Myers doubling with a
  * 4-tuple composite — consecutive h-block ranks concatenate to the
  * first-4h-chars order by the same argument that justifies the classic
  * pair; r18-verdict round-fusion study). Each round, at horizon h:
  *   (a) the three shifted ranks r[p+h], r[p+2h], r[p+3h] come from ONE
  *       per-doc `lead()` window over (id, pos) — pos is dense 1..len,
  *       so no shifted self-join and no per-shift exchange; default −1
  *       is the shorter-suffix-sorts-first tiebreak,
  *   (b) a DISTINCT over (r, r2, r3, r4) tuples, and
  *   (c) [[Zip.seqByOrderCounted]]'s range-exchange + two-pass
  *       contiguous numbering over those distinct tuples — never a
  *       one-task `row_number() OVER ()` window — whose count pass
  *       yields the round's class count driver-side for free.
  * ceil(log4(maxDocLen / seedLen)) rounds close the order (suffixes never
  * cross document boundaries, matching corpus semantics where documents
  * are independent). Rounds stop early once every rank is distinct —
  * the class count equals n — with no extra scan of the checkpoint.
  *
  * Scale notes (the 100 TB contract):
  *   - State per round is one (id, pos, rank) row per CHARACTER of the
  *     corpus — ~20 B/char shuffled through ~log2(maxDocLen) sort rounds.
  *     That is the known distributed-SA cost (Flick & Aluru 2015 pay the
  *     same log-round global sorts); it buys EXACT maximal repeats, where
  *     the 8-byte-per-WINDOW span family is the cheap approximate path.
  *     Use this operator for audit-grade repeat mining on a corpus slice;
  *     use the window family for full-corpus curation sweeps.
  *   - Per-round frames are eagerly lineage-truncated (DISK_ONLY local
  *     checkpoint, prior round released once the next is materialized) —
  *     the [[Dedup.connectedComponents]] / BpeTrain loop discipline; a
  *     run leaves no session-lifetime blocks behind.
  *   - The per-doc `lead()` windows bound the operator's document shape:
  *     each round sorts ONE document's rows within one task (the r19
  *     fusion's trade vs the position-keyed shifted self-join, which
  *     distributed by (id, pos) but paid three extra exchanges per
  *     round), and the shift distance 3·h must fit an Int
  *     (`toIntExact` fails loud past ~715M chars, never corrupts).
  *     Both bounds are far beyond real pre-chunked training documents
  *     (the q216 corpus contract: documents, not concatenated dumps);
  *     for degenerate giant-doc inputs, chunk upstream or revert to the
  *     join shape this fusion replaced (git history, r19).
  *   - Adjudicated alternative: Larsson–Sadakane-style tied-only
  *     refinement (re-sort only classes with >1 member per round) cuts
  *     per-round DATA but not jobs, and in a shuffle engine it trades
  *     the full-frame scan for (a) a corpus-sized rank table that must
  *     be REWRITTEN per round anyway (tied-class splits renumber class
  *     starts, and rank2 lookups land anywhere in the corpus) and
  *     (b) one-task skew on giant still-tied classes (exactly the
  *     template families the operator exists to find). Full-frame
  *     doubling keeps every round a uniform range-exchange — the shape
  *     Spark load-balances — so it is the deliberate choice, not an
  *     omission.
  *   - The position explode materializes one `sequence(1, len)` array per
  *     document (4 B/char transient); documents of ~10^8+ characters
  *     should be pre-chunked upstream (they exceed every other per-doc
  *     operator's assumptions here too).
  *   - r14 cost adjudication, MEASURED (sf0.1: 5,000 docs / 1.49M
  *     suffixes / maxLen 577; per-phase lap instrumentation): per-round
  *     wall time is FLAT at ~2.3 s whatever the round's byte volume,
  *     and the seed sort is ~5 s at every seedLen in [32, 256] — the
  *     cost is the ~6 job/stage round-trips per round × local-mode task
  *     latency, not bytes. Every persist-shaped lever measured SLOWER
  *     back-to-back: pinning seqByOrder's sorted parent against
  *     zipWithIndex's two-pass recompute, persisting the 3×-read join
  *     frame, and pre-reading the class count off a persisted
  *     distinct-pair frame (corpus-sized, not model-sized) together
  *     cost +10% wall and 2.2× CPU, so all were reverted. Tied-only
  *     Larsson–Sadakane refinement cuts bytes, not job count, so it
  *     cannot move a latency-bound round either. What remains and paid:
  *     seedLen 64 (one fewer round) and fusing n = sum(length) into the
  *     maxLen agg (drops the char-frame count job): 16.3 → 14.9 s
  *     scoped back-to-back.
  *   - r19 round-fusion, MEASURED (same scoped q216 harness, sf0.1,
  *     back-to-back both ways): quadrupling + lead-window shifts +
  *     counted re-rank + fixpoint materialization skip took the scoped
  *     wall 18.4–19.0 s → 13.7 s (1.36×) and CPU 111 s → 78 s — fewer
  *     rounds and ~2 fewer jobs per round, exactly the latency-bound
  *     prediction of the r14 study. The residual IS round-trip job
  *     latency at this fixture scale — the corpus is 46 MB; a cluster
  *     round is byte-bound and amortizes the same round-trips.
  *
  * Reference scope: the reference engine (WindowPublisher.java) has no
  * text operators at all — this extends the north-star LLM-pipeline
  * surface (SURVEY §2.10), not the reference API.
  */
object SuffixArray {

  /** Global suffix order of every character suffix in the corpus:
    * (id, pos, r) where `pos` is the 1-based character offset into that
    * document's `textCol` and `r` is the 0-based dense rank of the suffix
    * `substring(text, pos)` under lexicographic order, ties (byte-equal
    * suffixes from different docs) sharing one rank. The returned frame
    * is lineage-free (eager DISK_ONLY local checkpoint); its blocks are
    * reaped by the ContextCleaner when the caller drops the reference.
    *
    * `seedLen` is the round-0 horizon: suffixes are seeded with the dense
    * rank of their first `seedLen` characters (one string sort), then
    * each round extends the horizon ×4 via the 4-tuple composite — a
    * larger seed trades a slightly wider sort key for fewer rounds; at
    * this row volume round-trip job latency, not bytes, is the measured
    * per-round cost (r14 tuning, r19 fusion measurements in the object
    * doc).
    *
    * Rounds stop at the FIRST of: every rank distinct, the horizon
    * covering the longest document, or a no-refinement fixpoint. The
    * fixpoint exit is sound at ×4 exactly as at ×2: if some tie (p, q)
    * is still separable — first difference at character d, finite —
    * then the shifted pair (p+s, q+s) with s = d−4h (equal in ≥ h
    * chars, hence same class) splits THIS round, so an unchanged class
    * count means every remaining tie is a byte-equal suffix pair, i.e.
    * permanent; and since an unchanged count makes the refinement a
    * bijection, the re-rank reproduces `r` exactly, so the fixpoint
    * round's output frame is never materialized. The class count itself
    * comes free from [[Zip.seqByOrderCounted]]'s numbering pass — no
    * per-round scan of the checkpoint. */
  def suffixRanks(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      seedLen: Int = 64): DataFrame = {
    require(seedLen >= 1, s"seedLen must be >= 1, got $seedLen")
    val docs = df.select(col(idCol).cast(LongType).as("id"), col(textCol).as("txt"))
      // empty/null docs have no suffixes; also dodges Spark's DESCENDING
      // sequence(1, 0) == [1, 0], which would mint a phantom pos-0 suffix
      .where(length(col("txt")) >= 1)
    // one doc-level agg fuses BOTH loop constants: the doubling horizon
    // (max doc length) and n = total suffix count (sum of doc lengths) —
    // no count job over the exploded char-level frame ever runs
    val statsRow = docs
      .agg(max(length(col("txt"))), sum(length(col("txt")).cast(LongType)))
      .collect().head
    val maxLen: Int = if (statsRow.isNullAt(0)) 0 else statsRow.getInt(0)
    val n: Long = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val spark = df.sparkSession
    if (maxLen == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("id", LongType, nullable = false)
          .add("pos", LongType, nullable = false)
          .add("r", LongType, nullable = false))

    // One suffix per character: (id, pos, first-seedLen-chars). The seed
    // prefix ORDERS exactly like the suffix it truncates (a suffix
    // shorter than seedLen yields the whole remaining string, which
    // sorts before any extension of it — the prefix-order tiebreak).
    val sfx = docs
      .select(col("id"), explode(sequence(lit(1), length(col("txt")))).as("pos"),
        col("txt"))
      .select(col("id"), col("pos"),
        expr(s"substring(txt, pos, $seedLen)").as("pfx"))

    // Seed rank = dense rank of the distinct seed prefixes. seqByOrder
    // numbers a DISTINCT frame, so equal prefixes collapse to one row
    // first — dense by construction; the join key is the prefix itself.
    // The counted variant hands back the distinct-prefix count — the
    // round-0 class count — so no max(rank) scan of the checkpoint runs.
    val (seedRanks, seedClasses) = Zip.seqByOrderCounted(
      sfx.select(col("pfx")).distinct(), Seq(col("pfx")), "r")
    var cur = sfx.join(seedRanks.hint("shuffle_hash"), Seq("pfx"))
      .select(col("id"), col("pos").cast(LongType).as("pos"), col("r"))
      .localCheckpoint(true, StorageLevel.DISK_ONLY)

    // r18-verdict round-fusion study, all three levers MEASURED (sf0.1
    // scoped back-to-back, see q216 doc):
    //  (1) QUADRUPLING: each round extends the horizon ×4 via the
    //      4-tuple (r[p], r[p+o], r[p+2o], r[p+3o]) — consecutive
    //      o-block ranks concatenate to the first-4o-chars order, the
    //      same argument that justifies the classic pair. Halves the
    //      round count (the measured cost is per-round job latency, not
    //      bytes), for a slightly wider re-rank key.
    //  (2) LEAD, NOT SELF-JOIN: pos is dense 1..len per doc, so the
    //      shifted ranks are lead(r, k·o) over (id, pos) — one per-doc
    //      window exchange computes all three, where the join shape
    //      paid one corpus-sized exchange per shift. Default −1 is the
    //      shorter-suffix-sorts-first tiebreak, exactly the old
    //      coalesce. Per-doc partitions are bounded by the pre-chunk
    //      assumption above (docs ≫ 10^8 chars are out of scope).
    //  (3) COUNTED RE-RANK: the class count IS the distinct-tuple count,
    //      which the contiguous-numbering pass already collects —
    //      the per-round max(rank) scan of the checkpoint is gone, and
    //      an unchanged count (fixpoint ⇒ the refinement is a bijection
    //      ⇒ nr == r exactly, since r is already dense and each class
    //      maps to one tuple) exits WITHOUT materializing the identical
    //      final frame.
    // The fixpoint proof carries over to ×4 unchanged: a still-separable
    // tie with first difference at d > 4o yields the shifted tied pair
    // at s = d − 4o (equal in ≥ o chars ⇒ same class) that splits THIS
    // round, so an unchanged count still proves every tie permanent.
    try {
      var horizon: Long = seedLen.toLong
      var classes = seedClasses
      var done = classes == n
      while (!done && horizon < maxLen) {
        val o = horizon
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("pos"))
        val joined = cur.select(col("id"), col("pos"), col("r"),
          lead(col("r"), math.toIntExact(o), -1L).over(w).as("r2"),
          lead(col("r"), math.toIntExact(2L * o), -1L).over(w).as("r3"),
          lead(col("r"), math.toIntExact(3L * o), -1L).over(w).as("r4"))
        val tup = Seq(col("r"), col("r2"), col("r3"), col("r4"))
        val (ranked, nextClasses) = Zip.seqByOrderCounted(
          joined.select(tup: _*).distinct(), tup, "nr")
        if (nextClasses == classes) {
          // fixpoint: nr == r (see above) — cur already IS the answer
          done = true
        } else {
          val next = joined
            .join(ranked.hint("shuffle_hash"), Seq("r", "r2", "r3", "r4"))
            .select(col("id"), col("pos"), col("nr").as("r"))
            .localCheckpoint(true, StorageLevel.DISK_ONLY)
          val prior = cur
          cur = next
          org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(prior)
          horizon = o * 4
          done = nextClasses == n
          classes = nextClasses
        }
      }
      cur
    } catch {
      case t: Throwable =>
        try org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(cur)
        catch { case _: Throwable => () }
        throw t
    }
  }

  /** LCP of two string columns, capped at `cap` characters — the length
    * of the longest common prefix, evaluated as one codegen'd
    * higher-order fold (`acc = i−1` enforces contiguity: the fold can
    * only advance while every earlier character matched). */
  def lcpExpr(a: String, b: String, cap: Int): Column =
    expr(s"""aggregate(sequence(1, $cap), 0, (acc, i) ->
      IF(acc = i - 1 AND i <= least(length($a), length($b))
         AND substring($a, i, 1) = substring($b, i, 1), i, acc))""")
      .cast(LongType)

  /** Top-`topK` longest repeated substrings in the corpus, exact at any
    * length up to `lcpCap`: adjacent pairs in suffix order whose common
    * prefix is at least `minLen` characters, ranked by LCP. Output one
    * row per adjacent suffix-array pair — (lcp, rep, a_doc, a_pos,
    * b_doc, b_pos), `a` the suffix immediately BEFORE `b` in suffix
    * order and `rep` the repeated substring itself — so a run
    * of m occurrences of one repeat surfaces as its m−1 adjacent pairs
    * (the standard SA-audit presentation; occurrence counting beyond
    * that is [[Dedup.duplicatedSpanStats]]'s job).
    *
    * The suffix order is made TOTAL with the (id, pos) tiebreak before
    * adjacency, so the pair set is deterministic even when byte-equal
    * suffixes tie in rank. LCPs are computed on `lcpCap`-character
    * prefixes fetched per suffix straight from the document text (one
    * join back to the corpus — prefixes are never carried through the
    * doubling rounds). The result is collected (≤ topK rows, guarded)
    * so every intermediate checkpoint is released before returning. */
  def longestRepeats(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      lcpCap: Int = 64,
      minLen: Int = 20,
      topK: Int = 20): DataFrame = {
    require(topK <= 10000,
      s"longestRepeats collects the top-k result; topK=$topK exceeds the 10k driver guard")
    require(minLen >= 1 && minLen <= lcpCap,
      s"need 1 <= minLen <= lcpCap, got minLen=$minLen lcpCap=$lcpCap")
    val spark = df.sparkSession
    val docs = df.select(col(idCol).cast(LongType).as("id"), col(textCol).as("txt"))
    val ranks = suffixRanks(df, idCol, textCol)
    try {
      // total order: rank, then (id, pos) — deterministic adjacency
      val sa = Zip.seqByOrder(ranks, Seq(col("r"), col("id"), col("pos")), "sa")
      val withPfx = sa.join(docs, Seq("id"))
        .select(col("sa"), col("id"), col("pos"),
          expr(s"substring(txt, pos, $lcpCap)").as("pfx"))
        // referenced twice below (both sides of the adjacency join):
        // checkpoint so the global numbering runs once, not twice
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
      try {
        val a = withPfx.select(col("sa"), col("id").as("a_doc"),
          col("pos").as("a_pos"), col("pfx").as("a_pfx"))
        val b = withPfx.select((col("sa") - 1).as("sa"), col("id").as("b_doc"),
          col("pos").as("b_pos"), col("pfx").as("b_pfx"))
        val out = a.join(b, Seq("sa"))
          .withColumn("lcp", lcpExpr("a_pfx", "b_pfx", lcpCap))
          .where(col("lcp") >= minLen)
          .select(col("lcp"), expr("substring(a_pfx, 1, cast(lcp as int))").as("rep"),
            col("a_doc"), col("a_pos").cast(LongType).as("a_pos"),
            col("b_doc"), col("b_pos").cast(LongType).as("b_pos"))
          .orderBy(col("lcp").desc, col("a_doc"), col("a_pos"))
          .limit(topK)
          .collect() // ≤ topK rows: bounded driver state, frees all blocks
        spark.createDataFrame(
          spark.sparkContext.parallelize(out.toIndexedSeq, 1),
          new org.apache.spark.sql.types.StructType()
            .add("lcp", LongType, nullable = false)
            .add("rep", org.apache.spark.sql.types.StringType, nullable = true)
            .add("a_doc", LongType, nullable = false)
            .add("a_pos", LongType, nullable = false)
            .add("b_doc", LongType, nullable = false)
            .add("b_pos", LongType, nullable = false))
      } finally {
        org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(withPfx)
      }
    } finally {
      org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(ranks)
    }
  }
}
