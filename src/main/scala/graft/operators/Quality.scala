package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Repetition-based quality signals — the "repetitious text" family of
  * pretraining-corpus filters (cf. the repetition heuristics published
  * with the Gopher/MassiveText and C4 corpus work): excessive within-
  * document repetition is the single strongest cheap signal of boiler-
  * plate, scraped spam, and degenerate generations, and corpus pipelines
  * filter on it before anything model-based runs.
  *
  * Metrics per document (all over whitespace tokens):
  *  - `ttr` — type-token ratio, |distinct tokens| / |tokens|; low means a
  *    small vocabulary looped over a long document;
  *  - `dup2_frac` / `dup3_frac` — fraction of 2-/3-gram occurrences that
  *    are repeats of an earlier occurrence (1 − distinct/total); catches
  *    phrase-level looping that per-token TTR misses;
  *  - `top2_frac` — the most frequent 2-gram's share of all 2-gram
  *    occurrences; catches a single boilerplate phrase dominating an
  *    otherwise varied document.
  *
  * Scale shape: TTR and the dup fractions are per-row array arithmetic
  * over a staged token array (`size(array_distinct(...))`) — narrow
  * after the one explicit fan-out repartition every compact-table
  * pipeline here pins. The top-gram share needs a per-(doc, gram) mode, so
  * it takes the one shuffle in the operator: grams ride it as 64-bit
  * xxhash64 values (8 bytes each, never strings — a hash collision folds
  * two gram types together at ~2⁻⁶⁴ per doc pair, the same accepted
  * currency as [[Dedup.jaccardPairs]]), partially aggregated map-side,
  * then one co-partitioned join back to the narrow metrics on the doc id.
  */
object Quality {

  /** Staged (id, toks) projection — tokens must be a named attribute
    * BEFORE any lambda references them (lambda bodies get no CSE; an
    * inlined split would re-run once per array element). */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))

  /** Array of xxhash64 values of the doc's k-grams, in order (empty when
    * the doc has fewer than k tokens — `sequence` with a negative end
    * would count DOWN, so the short-doc case is guarded explicitly). */
  private def gramHashes(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => xxhash64((0 until k).map(j => element_at(toks, i + j + lit(1))): _*)))
      .otherwise(array().cast("array<bigint>"))

  /** Per-document repetition metrics:
    * (idCol, n_tokens, ttr, dup2_frac, dup3_frac, top2_frac), fractions
    * rounded to 4 decimals (genuine quotients — cross-engine safe). */
  def repetitionMetrics(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = tokens(df, idCol, textCol)
      // single-split guard: a compact doc table arrives in few input
      // splits and the gram fan-out would otherwise run single-task
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      // grams staged as attributes: each is referenced twice below, which
      // is exactly the multi-reference shape CollapseProject won't inline
      .select(col("id"), col("toks"),
        gramHashes(col("toks"), 2).as("g2"),
        gramHashes(col("toks"), 3).as("g3"))
    def dupFrac(g: Column): Column =
      when(size(g) > 0,
        round(lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 4))
        .otherwise(lit(0.0))
    val narrow = base.select(
      col("id"),
      size(col("toks")).cast(LongType).as("n_tokens"),
      round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4)
        .as("ttr"),
      dupFrac(col("g2")).as("dup2_frac"),
      dupFrac(col("g3")).as("dup3_frac"))
    // the one shuffle: (id, gram-hash) pairs, map-side combined; the join
    // back is id-to-id and co-partitions with the narrow frame.
    // explode_OUTER + null-filter, not plain explode: a non-outer Generate
    // triggers InferFiltersFromGenerate, whose inferred size(...)>0 filter
    // re-inlines the whole gram transform into the scan filter with the
    // token split re-evaluated PER LAMBDA ELEMENT — O(tokens²) per doc
    // (measured 10.3 s vs 0.6 s warm on 5 k docs at sf0.1). The rule
    // skips outer generates; the cheap isNotNull on the OUTPUT attribute
    // restores plain-explode semantics (short docs contribute no gram).
    val top2 = base.select(col("id"), explode_outer(col("g2")).as("h"))
      .where(col("h").isNotNull)
      .groupBy("id", "h").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 4).as("top2_frac"))
    narrow.join(top2, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"), col("ttr"),
        col("dup2_frac"), col("dup3_frac"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"))
  }

  /** Per-document mean unigram surprisal — the relational analogue of
    * the LM-perplexity corpus filter (CCNet-style): score each document
    * by the average −ln(corpus frequency) of its tokens. Gibberish and
    * rare-token noise score HIGH (surprising under the corpus unigram
    * model); boilerplate scores LOW. Two shuffles at corpus scale: the
    * vocabulary frequency aggregation and the token→frequency join, both
    * on 8-byte token hashes with map-side partial aggregation; the final
    * per-doc average co-partitions on the doc id. The frequency side is
    * vocabulary-sized, not corpus-sized, but is NOT assumed
    * broadcastable — AQE decides from its actual size.
    *
    * Each −ln(tf/total) contribution rounds into DECIMAL(28,14) before
    * the per-doc sum (the [[distributionDrift]] accumulation rule):
    * raw-double `avg` is partition-merge-order sensitive, and a mean
    * within a half-ulp of the 4th-decimal rounding boundary would flip
    * between parallelism configurations.
    *
    * Output: (idCol, n_tokens, surprisal), surprisal rounded to 4 (a
    * genuine quotient of logs — cross-engine safe under the repo's
    * rounding rule). */
  def unigramSurprisal(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), explode_outer(col("toks")).as("tok"))
      .where(col("tok").isNotNull)
      .select(col("id"), xxhash64(col("tok")).as("h"))
    // persist the VOCABULARY-sized frame, never the corpus-sized token
    // stream: freq is read twice (the join and the total), and without
    // the barrier each read would re-traverse the whole corpus. The
    // token stream itself is traversed twice (freq build + join side),
    // each pipelined straight off the scan — cheaper at scale than
    // materializing a corpus-sized token table. DISK_ONLY as everywhere;
    // blocks are session-cache managed (catalog.clearCache reclaims).
    val freq = toks.groupBy("h").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val total = freq.agg(sum(col("tf")).as("n_total"))
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    toks.join(freq, "h")
      .crossJoin(broadcast(total))
      .select(col("id"),
        (-log(col("tf").cast("double") / col("n_total")))
          .cast(DecimalType(28, 14)).as("s"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum("s").cast(DoubleType) / count(lit(1)), 4).as("surprisal"))
      .select(col("id").as(idCol), col("n_tokens"), col("surprisal"))
  }

  /** Per-document mean bigram surprisal — the next model up from
    * [[unigramSurprisal]] in the CCNet-style perplexity-filter family:
    * score each document by the average −ln P(w_i | w_{i−1}) under an
    * add-one-smoothed corpus bigram LM,
    *
    *   P(w2|w1) = (c(w1,w2) + 1) / (c(w1→·) + V)
    *
    * where c(w1→·) is w1's CONTEXT count (occurrences followed by
    * another token) and V the corpus vocabulary (distinct tokens seen in
    * any bigram position). The unigram filter scores rare WORDS;
    * this scores improbable TRANSITIONS — shuffled/garbled text built
    * from common words sails through a unigram model and spikes here.
    * Perplexity is exp(surprisal) (monotone — filter on either).
    *
    * Scale shape: ONE (h1, h2) pair aggregation over the corpus bigram
    * stream is the only corpus-touching step (16-byte hash-pair
    * currency, zipfian pairs collapse map-side; persisted
    * vocabulary²-bounded, in practice ≪ that). Context counts and the
    * vocabulary DERIVE from that frame — no second corpus pass. Scoring
    * joins each bigram occurrence back on (h1, h2), then (h1); every
    * occurrence hits (its own pair is in the LM), so the joins are
    * inner. Contributions are rounded into DECIMAL(28,14) before the
    * per-doc sum (order-insensitive, SQL-replayable — the
    * [[distributionDrift]] accumulation rule).
    *
    * Output: (idCol, n_bigrams, bigram_surprisal) rounded to 4; docs
    * with fewer than two tokens have no transitions and are absent. */
  def bigramSurprisal(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val bi = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      // (h1, h2) hash pairs in doc order; size-guarded like gramHashes
      // (sequence with a negative end would count DOWN)
      .select(col("id"),
        explode_outer(when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(
              xxhash64(element_at(col("toks"), i + lit(1))).as("h1"),
              xxhash64(element_at(col("toks"), i + lit(2))).as("h2"))))
          .otherwise(array().cast("array<struct<h1:bigint,h2:bigint>>"))).as("g"))
      .where(col("g").isNotNull)
      .select(col("id"), col("g.h1").as("h1"), col("g.h2").as("h2"))
    val bf = bi.groupBy("h1", "h2").agg(count(lit(1)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val uf = bf.groupBy("h1").agg(sum("cb").as("cu"))
    val vocab = bf.select(col("h1").as("h")).union(bf.select(col("h2").as("h")))
      .agg(count_distinct(col("h")).as("v"))
    bi.join(bf, Seq("h1", "h2"))
      .join(uf, Seq("h1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        (-log((col("cb") + lit(1.0)) / (col("cu") + col("v"))))
          .cast(DecimalType(28, 14)).as("s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("s").cast(DoubleType) / count(lit(1)), 4).as("bigram_surprisal"))
      .select(col("id").as(idCol), col("n_bigrams"), col("bigram_surprisal"))
  }

  /** Per-document mean trigram surprisal under an INTERPOLATED
    * KNESER-NEY language model (Kneser & Ney 1995; Chen & Goodman 1999's
    * interpolated form with a fixed absolute discount D = 3/4) — the
    * production-grade member of the CCNet perplexity-filter family:
    * [[unigramSurprisal]] scores rare words, [[bigramSurprisal]]'s
    * add-one model scores improbable transitions but systematically
    * over-penalizes unseen-mass in large vocabularies (add-one steals
    * V/(c+V) of every context); KN discounts each seen count by a fixed
    * D and backs off to CONTINUATION counts ("how many contexts does
    * this word complete") — the smoothing every real LM filter
    * (KenLM/CCNet) ships:
    *
    *   P(w3|w1w2) = (c(w1w2w3) − D)⁺/c(w1w2·) + D·T(w1w2)/c(w1w2·) · P(w3|w2)
    *   P(w3|w2)   = (N(·w2w3) − D)⁺/N(·w2·) + D·T(w2)/N(·w2·) · P(w3)
    *   P(w3)      = N(·w3)/N(··)
    *
    * where N(·w2w3) = distinct left-extensions of (w2,w3), T(ctx) =
    * distinct continuation types of the context, and every count is an
    * integer derived from the trigram TYPE frame.
    *
    * Exactness: all counts are exact int64; D = 0.75 is binary-exact, so
    * every (c − 0.75) and (0.75·T) is EXACT in doubles; the probability
    * is a fixed-order chain of IEEE mul/add/div on exact operands —
    * identical cross-engine — and −ln P rounds into DECIMAL(28,14)
    * before the per-doc sum (the [[bigramSurprisal]]/[[distributionDrift]]
    * accumulation rule, order-insensitive and SQL-replayable).
    *
    * Scale shape: ONE (h1,h2,h3) type aggregation touches the corpus
    * (24-byte hash-triple currency, zipfian types collapse map-side);
    * the bigram-continuation frame, both context frames, the
    * continuation-unigram frame and the type total all DERIVE from it —
    * no second corpus pass. The LM assembles per trigram TYPE (all
    * joins type-frame-sized), then the corpus stream joins the scored
    * LM ONCE on the triple. Output: (idCol, n_trigrams, kn_surprisal)
    * rounded to 4; docs with fewer than three tokens have no trigrams
    * and are absent. */
  def knTrigramSurprisal(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val tri = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"),
        explode_outer(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => struct(
              xxhash64(element_at(col("toks"), i + lit(1))).as("h1"),
              xxhash64(element_at(col("toks"), i + lit(2))).as("h2"),
              xxhash64(element_at(col("toks"), i + lit(3))).as("h3"))))
          .otherwise(array()
            .cast("array<struct<h1:bigint,h2:bigint,h3:bigint>>"))).as("g"))
      .where(col("g").isNotNull)
      .select(col("id"), col("g.h1").as("h1"), col("g.h2").as("h2"),
        col("g.h3").as("h3"))
    // the ONE corpus aggregation; every LM statistic derives from it
    val tf3 = tri.groupBy("h1", "h2", "h3").agg(count(lit(1)).as("c3"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val ctx3 = tf3.groupBy("h1", "h2")
      .agg(sum("c3").cast(LongType).as("cden"), count(lit(1)).as("t3"))
    val bc = tf3.groupBy("h2", "h3").agg(count(lit(1)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val mid = bc.groupBy("h2")
      .agg(sum("cb").cast(LongType).as("den2"), count(lit(1)).as("t2"))
    val uni = bc.groupBy("h3").agg(count(lit(1)).as("nw3"))
    val tot = bc.agg(count(lit(1)).as("nbi"))
    // fixed-order IEEE chain on exact operands (see scaladoc); the
    // greatest() guards restate the formula's (c - D)+ — with the LM
    // trained on the scored corpus itself every count is >= 1 > D
    val lm = tf3
      .join(ctx3, Seq("h1", "h2"))
      .join(bc, Seq("h2", "h3"))
      .join(mid, Seq("h2"))
      .join(uni, Seq("h3"))
      .crossJoin(broadcast(tot))
      .select(col("h1"), col("h2"), col("h3"),
        (-log(
          (greatest(col("c3").cast(DoubleType) - lit(0.75), lit(0.0)) +
            (lit(0.75) * col("t3")) *
              ((greatest(col("cb").cast(DoubleType) - lit(0.75), lit(0.0)) +
                (lit(0.75) * col("t2")) *
                  (col("nw3").cast(DoubleType) / col("nbi"))) / col("den2"))) /
            col("cden")))
          .cast(DecimalType(28, 14)).as("s"))
    tri.join(lm, Seq("h1", "h2", "h3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum("s").cast(DoubleType) / count(lit(1)), 4).as("kn_surprisal"))
      .select(col("id").as(idCol), col("n_trigrams"), col("kn_surprisal"))
  }

  /** Per-document token ENTROPY — −Σ p·ln p over the document's own
    * token distribution (p = within-doc frequency). The information-
    * density axis the repetition family approximates from the other
    * side: TTR and dup-fractions count REPEATS, entropy weighs them —
    * a doc looping a 5-word banner and a doc with one dominant token
    * and a varied tail can tie on TTR but never on entropy. Low entropy
    * = degenerate/boilerplate; entropy ≈ ln(n_tokens) = every token
    * distinct. `norm_entropy` (entropy / ln n_tokens ∈ [0,1]) is the
    * length-independent filter knob.
    *
    * Scale shape: one (doc, token-hash) aggregation with map-side
    * combining (the [[repetitionMetrics]] top2 shuffle, 8-byte
    * currency), then a per-doc sum co-partitioned on the doc id.
    * Contributions round into DECIMAL(28,14) before the sum (the
    * [[distributionDrift]] accumulation rule), so q104 replays the
    * statistic in SQL. */
  def tokenEntropy(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val tf = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), explode_outer(col("toks")).as("tok"))
      .where(col("tok").isNotNull)
      .select(col("id"), xxhash64(col("tok")).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("c"))
    val n = tf.groupBy("id").agg(sum("c").as("n_tokens"))
    tf.join(n, "id")
      .select(col("id"), col("n_tokens"),
        (-(col("c") / col("n_tokens")) * log(col("c") / col("n_tokens")))
          .cast(DecimalType(28, 14)).as("e"))
      .groupBy("id", "n_tokens")
      .agg(round(sum("e").cast(DoubleType), roundTo).as("entropy"))
      .select(col("id").as(idCol), col("n_tokens"), col("entropy"),
        when(col("n_tokens") > 1,
          round(col("entropy") / log(col("n_tokens").cast(DoubleType)), roundTo))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Per-document compression ratio — deflate(text).length / raw bytes,
    * the byte-level redundancy signal (CCNet/RefinedWeb-family
    * heuristic): repeated boilerplate, padded markup, and degenerate
    * generations compress far below prose, and byte-level DEFLATE
    * catches redundancy that token-level TTR ([[repetitionMetrics]])
    * and [[tokenEntropy]] miss (character-level loops, markup chrome).
    * Typical filters drop ratio < ~0.3 (extreme repetition) and
    * > ~1.0 (already-compressed/binary junk).
    *
    * Scale shape: a pure codegen'd per-row kernel
    * ([[graft.expressions.DeflateSize]]) — no shuffle, no state; the
    * scan is the only corpus-touching step. Not DuckDB-expressible, so
    * the q114 gate is rows-only; brute-force equality is spec-gated. */
  def compressionRatio(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val dz = ColumnGlue.column(graft.expressions.DeflateSize(
      ColumnGlue.expression(col(textCol))))
    df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        dz.as("deflate_bytes"))
      .withColumn("ratio",
        when(col("n_bytes") > 0,
          round(col("deflate_bytes").cast("double") / col("n_bytes"), roundTo))
          .otherwise(lit(null)))
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023, reduced to
    * its unigram form): per-document mean log-likelihood ratio between a
    * TARGET domain's unigram LM and the corpus-wide LM,
    *
    *   importance(d) = (1/|d|) · Σ_tok [ ln p̂_target(tok) − ln p̂_corpus(tok) ]
    *
    * with add-one smoothing over the corpus vocabulary on both models (a
    * target count of zero must stay finite). Documents that look like the
    * target domain score high; resampling/filtering on this weight tilts
    * a generic crawl toward the domain without a trained classifier.
    *
    * Scale shape is [[unigramSurprisal]]'s: both LMs are VOCABULARY-sized
    * frames persisted once (never the corpus-sized token stream), tokens
    * ride joins as 8-byte xxhash64 values, and the per-doc mean is a
    * map-side-combining aggregation. The target set is typically a small
    * curated sample, but nothing here requires that — both sides stream.
    *
    * Each log-ratio contribution rounds into DECIMAL(28,14) before the
    * per-doc sum (the [[distributionDrift]] accumulation rule): a raw
    * double sum's value depends on partition merge order, and a mean
    * sitting within a half-ulp of a 4th-decimal rounding boundary flips
    * between parallelism configurations — exact decimal accumulation
    * makes the statistic order-insensitive and SQL-replayable.
    *
    * Output: (idCol, n_tokens, importance), importance rounded to 4 (a
    * genuine quotient — cross-engine safe). */
  def importanceWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    def tokHashes(df: DataFrame): DataFrame =
      tokens(df, idCol, textCol)
        .repartition(par, col("id"))
        .select(col("id"), explode_outer(col("toks")).as("tok"))
        .where(col("tok").isNotNull)
        .select(col("id"), xxhash64(col("tok")).as("h"))
    val toks = tokHashes(corpus)
    val cf = toks.groupBy("h").agg(count(lit(1)).as("cf"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val tf = tokHashes(target).groupBy("h").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // scalar model constants: corpus size, vocab size, target size (an
    // empty target degenerates to the uniform model via smoothing)
    val stats = cf.agg(sum(col("cf")).as("nc"), count(lit(1)).as("v"))
      .crossJoin(tf.agg(coalesce(sum(col("tf")), lit(0L)).as("nt")))
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val lw = cf.join(tf, Seq("h"), "left")
      .crossJoin(broadcast(stats))
      .select(col("h"),
        (log((coalesce(col("tf"), lit(0L)) + lit(1.0)) / (col("nt") + col("v"))) -
          log((col("cf") + lit(1.0)) / (col("nc") + col("v"))))
          .cast(DecimalType(28, 14)).as("lw"))
    toks.join(lw, "h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum("lw").cast(DoubleType) / count(lit(1)), 4).as("importance"))
      .select(col("id").as(idCol), col("n_tokens"), col("importance"))
  }

  /** [[repetitionMetrics]] plus a `keep` verdict — the actual corpus
    * filter decision. Defaults are calibrated loose (repetition filters
    * drop outliers, not the median document); every threshold is a knob.
    *
    * PUSHDOWN HAZARD: `keep` (and the metrics) are projections over the
    * token pipeline, and a downstream `.filter(col("keep"))` gets pushed
    * BELOW the projection — Filter-below-Project substitution has no
    * lambda CSE, so the whole token pipeline re-inlines into the filter
    * condition (measured ~30× on q82's manifest composition, see
    * BASELINE.md). When filtering on the verdict, materialize first:
    * `repetitionFilter(df).persist(DISK_ONLY).filter(col("keep"))`. */
  def repetitionFilter(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTtr: Double = 0.3,
      maxDup3: Double = 0.05,
      maxTop2: Double = 0.12): DataFrame =
    repetitionMetrics(df, idCol, textCol)
      .withColumn("keep",
        col("ttr") >= minTtr && col("dup3_frac") <= maxDup3 &&
          col("top2_frac") <= maxTop2)

  /** Per-slice distribution DRIFT: KL(P_slice ‖ P_corpus) between each
    * slice's unigram token distribution and the whole corpus's — the
    * corpus-mix monitor (a source whose language suddenly shifts — spam
    * influx, scraper breakage, domain takeover — jumps here long before
    * downstream evals move; also the audit for recrawl deltas via
    * [[Changes.snapshotDelta]]'s changed slice vs the old corpus).
    * KL = Σ_tok p·ln(p/q) over tokens PRESENT in the slice (p > 0); q > 0
    * always since every slice token is a corpus token.
    *
    * Scale shape: tokens ride as 8-byte xxhash64 values
    * ([[unigramSurprisal]]'s currency); ONE corpus-wide (slice, token)
    * aggregation (map-side combined) is the only 100 TB-touching step
    * and is persisted VOCABULARY×slices-sized; slice totals and the
    * corpus LM derive from it, never from a second corpus pass. Each KL
    * contribution is cast to DECIMAL(28,14) before the sum (exact,
    * order-insensitive accumulation — transcendental values, no decimal
    * tie surface), so the whole statistic replays in SQL (q91). */
  def distributionDrift(
      df: DataFrame,
      sliceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val toks = df
      .select(col(sliceCol).as("slice"), col(idCol).as("id"),
        split(col(textCol), "\\s+").as("toks"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("slice"), explode(col("toks")).as("tok"))
      .select(col("slice"), xxhash64(col("tok")).as("h"))
    val sf = toks.groupBy("slice", "h").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val sn = sf.groupBy("slice").agg(sum("c").cast(LongType).as("ns"))
    val cf = sf.groupBy("h").agg(sum("c").cast(LongType).as("ct"))
    val cn = cf.agg(sum("ct").cast(LongType).as("nt"))
    sf.join(cf, "h")
      .join(broadcast(sn), "slice")
      .crossJoin(broadcast(cn))
      .select(col("slice"),
        ((col("c") / col("ns")) * log((col("c") / col("ns")) / (col("ct") / col("nt"))))
          .cast(DecimalType(28, 14)).as("kld"))
      .groupBy("slice")
      .agg(round(sum("kld").cast(DoubleType), roundTo).as("kl"))
      .select(col("slice").as(sliceCol), col("kl"))
  }

  /** Unigram LM frame — (token-hash `h`, count `ct`) — for
    * [[distributionDriftAgainst]]: compute ONCE over the reference
    * corpus, persist, and probe per incoming slice/micro-batch (the
    * precompute-and-reuse contract of `minHashBandsPortable` /
    * `newContentOnly`'s sha set, in LM space). */
  def unigramLm(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(explode(col("toks")).as("tok"))
      .select(xxhash64(col("tok")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("ct"))

  /** [[distributionDrift]] against a FIXED reference LM — the recrawl
    * audit (a [[Changes.snapshotDelta]] `added+changed` slice vs the old
    * corpus) and the streaming monitor (per micro-batch vs the landed
    * corpus; composes under foreachBatch exactly like the ingest gates).
    *
    * Unlike the self-corpus form, an incoming token may be ABSENT from
    * the reference — q is add-one smoothed over the reference
    * vocabulary: q(tok) = (ct(tok)+1) / (nt+V), ct=0 when unseen (the
    * [[importanceWeights]] smoothing rule), so unseen tokens contribute
    * large-but-finite drift. KL = Σ p·ln(p/q) over incoming tokens,
    * DECIMAL(28,14)-accumulated; the reference LM is touched only
    * through its (h, ct) frame and two scalar stats — the reference
    * corpus itself never re-scans. */
  def distributionDriftAgainst(
      df: DataFrame,
      referenceLm: DataFrame,
      sliceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val toks = df
      .select(col(sliceCol).as("slice"), col(idCol).as("id"),
        split(col(textCol), "\\s+").as("toks"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("slice"), explode(col("toks")).as("tok"))
      .select(col("slice"), xxhash64(col("tok")).as("h"))
    val sf = toks.groupBy("slice", "h").agg(count(lit(1)).as("c"))
    val sn = sf.groupBy("slice").agg(sum("c").cast(LongType).as("ns"))
    val stats = referenceLm.agg(
      sum("ct").cast(LongType).as("nt"), count(lit(1)).cast(LongType).as("vsz"))
    sf.join(referenceLm, Seq("h"), "left_outer")
      .join(broadcast(sn), "slice")
      .crossJoin(broadcast(stats))
      .select(col("slice"),
        ((col("c") / col("ns")) *
          log((col("c") / col("ns")) /
            ((coalesce(col("ct"), lit(0L)) + lit(1L)) / (col("nt") + col("vsz")))))
          .cast(DecimalType(28, 14)).as("kld"))
      .groupBy("slice")
      .agg(round(sum("kld").cast(DoubleType), roundTo).as("kl"))
      .select(col("slice").as(sliceCol), col("kl"))
  }

  /** Corpus boilerplate AUDIT: the k n-grams appearing in the most
    * documents, by document frequency (C4/Gopher-style boilerplate
    * detection — navigation chrome, license banners, cookie notices
    * surface here; the removal ACTION on what the audit flags is
    * [[Dedup.removeSpansMatching]]).
    *
    * Scale shape: tokenize → per-doc DISTINCT shingle strings → explode
    * is all NARROW ([[graft.functions.TextOps.shinglesFromTokens]] — the
    * per-doc distinct makes the count a document frequency with no
    * (doc, gram) dedup shuffle); then ONE map-side-combining aggregation
    * keyed by gram (zipfian hot grams collapse to one partial row per
    * partition before the exchange) and a TakeOrdered top-k (per-
    * partition heaps, k rows to the driver — never a global sort).
    * (df DESC, gram) totally orders, so the cut at k is deterministic. */
  def boilerplateNgrams(
      df: DataFrame,
      n: Int = 3,
      k: Int = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextOps
    val base = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
    base
      .select(explode(TextOps.shinglesFromTokens(col("toks"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram"))
      .limit(k)
  }

  /** Per-slice Zipf slope: OLS fit of ln(freq) on ln(rank) over the
    * slice's token frequency spectrum — the distributional-health
    * scalar (natural text sits near slope −1; templated/boilerplate
    * slices flatten the head, spam/generated text fattens the tail).
    * `r2` is the fit quality: a low r² says the spectrum isn't a power
    * law at all, a drift signal no single quantile catches.
    *
    * Output: (sliceCol, n_types, zipf_slope, r2), slope/r² rounded
    * (genuine quotients), ordered by slice.
    *
    * Scale shape: ONE (slice, token) aggregation touches the corpus;
    * ranking is a window over the types-sized frame (partitioned by
    * slice — rank must be global within slice, and types ≪ tokens).
    * The OLS moments accumulate per-type ln contributions as
    * DECIMAL(28,14) (the drift-family rule: transcendental sums are
    * order-sensitive in double, exact in decimal), then the slope/r²
    * arithmetic runs on five scalars — both engines evaluate the
    * identical expression on identical inputs. */
  def zipfSlope(
      df: DataFrame,
      sliceCol: String = "source",
      textCol: String = "text",
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val st = df
      .select(col(sliceCol).as("slice"), explode(split(col(textCol), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("slice", "tok").agg(count(lit(1)).as("c"))
    val ranked = st.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("slice").orderBy(col("c").desc, col("tok"))))
    val D = DecimalType(28, 14)
    val x = log(col("rk").cast(DoubleType))
    val y = log(col("c").cast(DoubleType))
    val agg = ranked
      .select(col("slice"), x.cast(D).as("x"), y.cast(D).as("y"),
        (x * y).cast(D).as("xy"), (x * x).cast(D).as("xx"), (y * y).cast(D).as("yy"))
      .groupBy("slice")
      .agg(count(lit(1)).cast(LongType).as("n_types"),
        sum("x").cast(DoubleType).as("sx"), sum("y").cast(DoubleType).as("sy"),
        sum("xy").cast(DoubleType).as("sxy"), sum("xx").cast(DoubleType).as("sxx"),
        sum("yy").cast(DoubleType).as("syy"))
    val n = col("n_types").cast(DoubleType)
    val covN = n * col("sxy") - col("sx") * col("sy")
    val varXN = n * col("sxx") - col("sx") * col("sx")
    val varYN = n * col("syy") - col("sy") * col("sy")
    agg.select(col("slice").as(sliceCol), col("n_types"),
        round(covN / nullif(varXN, lit(0.0)), roundTo).as("zipf_slope"),
        round(covN * covN / nullif(varXN * varYN, lit(0.0)), roundTo).as("r2"))
      .orderBy(sliceCol)
  }

  /** Top-k PMI collocations: pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))) over adjacent token bigrams — the
    * association audit (Church & Hanks, CL 1990). Boilerplate phrases
    * ([[boilerplateNgrams]]) rank by raw document frequency — "of the"
    * tops that list; PMI ranks by LIFT over independence, surfacing the
    * multiword units ("new york") whose parts rarely occur apart. The
    * `minCount` floor is the standard PMI guard: a hapax pair of two
    * hapax tokens scores the maximal PMI, so unfloored rankings are
    * noise (the 1990 paper's own caveat).
    *
    * Output: (w1, w2, c_ab, pmi) — the top `k` pairs with c_ab ≥
    * `minCount` under the (pmi DESC, w1, w2) total order, pmi rounded to
    * `roundTo` (the ranking runs on the ROUNDED value: cross-engine
    * float-ordering stability, the q36 rule).
    *
    * Scale shape: one unigram + one bigram aggregation over the
    * token-staged corpus (both zipf-collapse map-side; short-token pair
    * keys make hash currency a wash, so the group keys ARE the strings
    * and the oracle replays verbatim — a 2⁻⁶⁴-collision-free choice,
    * unlike the hash-keyed drift frames). The `minCount` filter shrinks
    * the pair frame BEFORE the two unigram-attach joins (AQE picks
    * broadcast when the type dictionary fits, shuffle otherwise); the
    * scalar totals ride 1-row broadcast cross joins; the final top-k is
    * a TakeOrdered heap, never a full sort. */
  def pmiCollocations(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 20,
      minCount: Long = 5L,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(k >= 1, s"k $k must be >= 1")
    require(minCount >= 1L, s"minCount $minCount must be >= 1")
    val base = tokens(df, idCol, textCol)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val uni = base.select(explode(col("toks")).as("tok")).where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cu"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nt = uni.agg(sum("cu").cast(LongType).as("nt"))
    // ALL adjacent occurrences — shinglesFromTokens would distinct per doc
    val bigrams = when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    val bi = base.select(explode(bigrams).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
    val np = bi.agg(sum("c").cast(LongType).as("np"))
    bi.filter(col("c") >= minCount)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
      .join(uni.select(col("tok").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("cu").as("c2")), "w2")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(np))
      .select(col("w1"), col("w2"), col("c").cast(LongType).as("c_ab"),
        round(log((col("c") * lit(1.0) / col("np")) /
          ((col("c1") * lit(1.0) / col("nt")) * (col("c2") * lit(1.0) / col("nt")))),
          roundTo).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Vocabulary coverage / OOV audit: take the top-`vocabSize` corpus
    * tokens by frequency as THE vocabulary (ties broken by token — a
    * total order, so the vocab is a pure function of the corpus), then
    * per slice report how much of its token mass that vocabulary covers
    * and how many distinct out-of-vocabulary types remain. The
    * fixed-vocab tokenizer question every mixture decision hides: a
    * source whose coverage lags the corpus burns its token budget on
    * fragmented/unk encodings (the L42 mixer weighs token MASS; this is
    * the audit that says whether that mass is spendable).
    *
    * Output: (sliceCol, total_toks, invocab_toks, coverage, oov_types),
    * coverage a genuine quotient rounded to `roundTo`, ordered by slice.
    *
    * Scale shape: ONE (slice, token) aggregation touches the corpus
    * (zipfian tokens collapse map-side; the persisted frame is
    * slices×types-sized). Everything downstream derives from it: corpus
    * counts by a second small aggregation, the vocabulary by
    * TakeOrdered (top-k heap, never a full sort), membership by a
    * BROADCAST join against the model-sized vocab — the corpus never
    * moves again. */
  def vocabCoverage(
      df: DataFrame,
      sliceCol: String = "lang",
      textCol: String = "text",
      vocabSize: Int = 100,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(vocabSize >= 1, s"vocabSize $vocabSize must be >= 1")
    val st = df
      .select(col(sliceCol).as("slice"), explode(split(col(textCol), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("slice", "tok").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val vocab = st.groupBy("tok").agg(sum("n").as("cn"))
      .orderBy(col("cn").desc, col("tok")).limit(vocabSize)
      .select("tok")
    val totals = st.groupBy("slice").agg(sum("n").cast(LongType).as("total_toks"))
    val iv = st.join(broadcast(vocab), "tok")
      .groupBy("slice").agg(sum("n").cast(LongType).as("invocab_toks"))
    val oov = st.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy("slice").agg(count(lit(1)).as("oov_types"))
    totals
      .join(iv, Seq("slice"), "left")
      .join(oov, Seq("slice"), "left")
      .select(col("slice").as(sliceCol),
        col("total_toks"),
        coalesce(col("invocab_toks"), lit(0L)).as("invocab_toks"),
        round(coalesce(col("invocab_toks"), lit(0L)) / col("total_toks"), roundTo)
          .as("coverage"),
        coalesce(col("oov_types"), lit(0L)).as("oov_types"))
      .orderBy(sliceCol)
  }

  /** Boilerplate REMOVAL at unit granularity — the C4/Dolma curation
    * action paired with [[boilerplateNgrams]]'s audit: any unit
    * (sentence, line, paragraph — whatever `units` extracts) present in
    * MORE than `maxDf` distinct documents is cut from every document,
    * and each doc's surviving units reassemble in original order.
    * Cross-doc frequency is what separates chrome (cookie banners,
    * nav menus — in thousands of docs) from prose; within-doc
    * repetition is [[repetitionStats]]' jurisdiction.
    *
    * Scale shape: posexplode is NARROW; corpus-wide doc-frequency is ONE
    * aggregation keyed by the unit's md5 (count_distinct over doc ids —
    * fixed 32-hex currency, engine-portable so the oracle can replay the
    * grouping; a production caller at 100 TB would swap in xxhash64 and
    * halve the key bytes); the verdict joins back by that same hash
    * (hot boilerplate hashes collapse map-side before the exchange);
    * reassembly is a per-DOC collect of its own units — bounded by
    * document size, the q64 cutSpans shape, never a corpus collect.
    * Docs losing every unit survive as empty text (LEFT join), so the
    * removal never silently drops a document row.
    *
    * Output: (idCol, n_units, kept_units, clean_text). */
  def dropBoilerplateUnits(
      df: DataFrame,
      units: Column,
      maxDf: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(maxDf >= 1, s"maxDf $maxDf must be >= 1")
    // null elements in a caller-supplied units array are dropped UP
    // FRONT and excluded from n_units — a null unit has no md5, so it
    // could never match the frequency join and would otherwise be cut
    // silently regardless of df, violating the only->maxDf contract
    val ex = df
      .select(col(idCol).as("id"),
        posexplode(filter(coalesce(units,
          array().cast("array<string>")), _.isNotNull)).as(Seq("pos", "u")))
      .select(col("id"), col("pos"), col("u"), md5(col("u")).as("h"))
      // referenced three times below (frequency, verdict join, per-doc
      // totals): unpersisted, each reference re-runs the caller's unit
      // extractor (for q134, a full regex sentence split) over the
      // whole corpus — the q64-class DISK_ONLY cut, session-cache
      // managed like every persist here
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val freq = ex.groupBy("h").agg(count_distinct(col("id")).as("df_"))
    val kept = ex.join(freq, "h").filter(col("df_") <= maxDf)
    val per = kept.groupBy("id").agg(
      count(lit(1)).as("kept_units"),
      concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos"), col("u")))),
          x => x("u"))).as("clean_text"))
    // per-doc totals from the SAME exploded frame (no re-evaluation of
    // the extractor); the base id scan keeps docs with zero units alive
    val totals = ex.groupBy("id").agg(count(lit(1)).as("n_units_"))
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_units_"), lit(0L)).as("n_units"),
        coalesce(col("kept_units"), lit(0L)).as("kept_units"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Hashed n-gram linear classifier scoring — the fastText-shaped
    * model-based quality gate (Joulin 2016, "Bag of Tricks"): the
    * workhorse of published pretraining pipelines (CCNet's LM filter,
    * LLaMA's Wikipedia-reference classifier) is a LINEAR model over
    * hashing-trick n-gram features, and inference is pure relational
    * algebra — no model runtime needed at 100 TB, just a broadcast of
    * the weight vector.
    *
    * Features are lowercased whitespace unigrams + adjacent bigrams,
    * hashed into `dim` buckets with the [[Sampling]] avalanche polyhash
    * (the engine's one portable hash family — exact int64 arithmetic,
    * SQL-replayable). `weights` is the trained model: `(bucket: long,
    * weight: double)`, weight values exact at ≤6 decimals (the published
    * quantized-model convention; enforced by the DECIMAL(30,6)
    * accumulation cast). Buckets absent from `weights` contribute 0 but
    * still count — the hashing-trick model's domain is all of [0, dim).
    * Duplicate bucket rows SUM (the model frame is a sparse vector in
    * coordinate form, and linear-model deltas add — a base model unioned
    * with a fine-tuning delta works unchanged; spec-pinned).
    *
    * Output: (idCol, n_features, score) where score = round(Σw/n, 6) —
    * mean feature weight, exact-decimal accumulated so partition merge
    * order cannot perturb it (the [[distributionDrift]] rule), rounded
    * as a genuine quotient. Thresholding into a keep verdict is the
    * caller's POLICY (compose with [[repetitionFilter]]'s persist-
    * before-filter discipline).
    *
    * Scale shape: one staged token projection (lambda-CSE rule), one
    * explode, a BROADCAST join against the model-sized weight frame
    * (dim ≤ 2²⁴ ⇒ ≤ ~256 MB — never a shuffle), and ONE doc-keyed
    * aggregation with map-side combining. The corpus is read once;
    * nothing in the plan depends on corpus size except the final
    * exchange of (id, partial-sum) pairs — the fan-out repartition is
    * ROUND-ROBIN, not id-keyed, precisely so the groupBy cannot reuse
    * it: a keyed repartition here would ship the full token arrays
    * (≈ corpus text size) instead of the tiny partials. */
  def hashedLinearScore(
      df: DataFrame,
      weights: DataFrame,
      dim: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = ""): DataFrame = {
    require(dim >= 2, s"dim $dim must be >= 2")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toksDf = df
      .select(col(idCol).as("id"), split(lower(col(textCol)), "\\s+").as("toks"))
      // single-split guard only: spread the explode work, keep the
      // exchange currency narrow (see scale-shape note above)
      .repartition(par)
    val grams = toksDf.select(col("id"),
      concat(col("toks"),
        when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            j => concat_ws(" ", element_at(col("toks"), j),
              element_at(col("toks"), j + 1))))
          .otherwise(array().cast("array<string>"))).as("grams"))
    val feats = grams
      // outer + null-filter: the InferFiltersFromGenerate dodge
      .select(col("id"), explode_outer(col("grams")).as("g"))
      .where(col("g").isNotNull)
      .select(col("id"), (Sampling.avalanche(col("g"), salt) % dim).as("b"))
    // sum duplicate bucket rows BEFORE the broadcast: the model is a
    // sparse vector in coordinate form; without this, a duplicated
    // bucket would fan out the join and silently inflate n_features
    val w = broadcast(weights
      .groupBy(col("bucket").as("b"))
      .agg(sum(col("weight").cast(DecimalType(30, 6))).as("w_")))
    feats.join(w, Seq("b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_features"),
        round(coalesce(sum("w_"), lit(0).cast(DecimalType(30, 6)))
          .cast(DoubleType) / count(lit(1)), 6).as("score"))
      .select(col("id").as(idCol), col("n_features"), col("score"))
  }

  /** The Gopher/MassiveText stop words (Rae et al. 2021, A.1.1): a doc
    * that contains fewer than 2 of these is overwhelmingly non-prose. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published Gopher/MassiveText document-quality rule bundle
    * (Rae et al. 2021, Appendix A.1.1) — the de-facto standard heuristic
    * gate every web-scale pretraining pipeline runs before anything
    * model-based: per document, the seven rules with their published
    * thresholds as defaults, emitted as measured metrics PLUS per-rule
    * booleans PLUS the conjunction, so a pipeline can gate on `pass`
    * while an audit reads WHICH rule fired (cf. the reference's
    * windowed-gate idiom, WindowPublisher.java:80-82: admit or divert,
    * never silently drop).
    *
    * Rules (keep iff all hold):
    *  1. `minWords ≤ n_words ≤ maxWords`;
    *  2. mean word length in `[minMeanWordLen, maxMeanWordLen]`;
    *  3. symbol-to-word ratio (`#` and `...` occurrences / words)
    *     ≤ `maxSymbolRatio`;
    *  4. ≤ `maxBulletLineFrac` of lines start with a bullet (`• `/`- `);
    *  5. ≤ `maxEllipsisLineFrac` of lines end with `...`/`…`;
    *  6. ≥ `minAlphaWordFrac` of words contain an alphabetic char;
    *  7. ≥ `minStopwordHits` distinct [[GopherStopWords]] present.
    *
    * Rule comparisons read the ROUNDED (4-decimal) fractions, so the
    * verdict replays bit-identically in ANSI SQL (the house rounded-
    * quotient rule); words are whitespace tokens with empties dropped,
    * lines are `\n` splits with empties dropped (a trailing newline adds
    * no line on either engine).
    *
    * Scale shape: one narrow per-row projection chain — zero shuffles,
    * zero UDFs, no explode; tokens/lines staged once as attributes (the
    * lambda-CSE discipline — each is referenced by several rule lambdas,
    * the multi-reference shape CollapseProject keeps staged). The one
    * repartition is the compact-table single-split guard shared with
    * [[repetitionMetrics]]: per-row HOF work is real and must spread.
    * Degenerate docs (empty text) fail rule 1 and carry 0-metrics rather
    * than NULLs, so downstream aggregates never need null guards. */
  def gopherRules(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"gopherRules: bad word bounds [$minWords, $maxWords]")
    val staged = df
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), col("t"),
        filter(split(col("t"), "\\s+"), w => w =!= "").as("ws"),
        filter(split(col("t"), "\n"), l => l =!= "").as("ls"))
    val counted = staged.select(
      col("id"),
      size(col("ws")).cast(LongType).as("n_words"),
      aggregate(col("ws"), lit(0L), (a, w) => a + length(w)).as("sum_len"),
      ((length(col("t")) - length(replace(col("t"), lit("#"), lit("")))) +
        (length(col("t")) - length(replace(col("t"), lit("..."), lit("")))) / 3)
        .cast(LongType).as("n_symbols"),
      size(col("ls")).cast(LongType).as("n_lines"),
      size(filter(col("ls"),
        l => l.startsWith("• ") || l.startsWith("- ")))
        .cast(LongType).as("n_bullet"),
      size(filter(col("ls"),
        l => l.endsWith("...") || l.endsWith("…")))
        .cast(LongType).as("n_ell"),
      size(filter(col("ws"), w => w.rlike("[A-Za-z]")))
        .cast(LongType).as("n_alpha"),
      size(filter(array(GopherStopWords.map(lit): _*),
        s => array_contains(col("ws"), s))).cast(LongType).as("stop_hits"))
    def frac(n: Column, d: Column): Column =
      when(d > 0, round(n.cast("double") / d, 4)).otherwise(lit(0.0))
    val metrics = counted.select(
      col("id"), col("n_words"),
      frac(col("sum_len"), col("n_words")).as("mean_word_len"),
      frac(col("n_symbols"), col("n_words")).as("symbol_ratio"),
      frac(col("n_bullet"), col("n_lines")).as("bullet_line_frac"),
      frac(col("n_ell"), col("n_lines")).as("ellipsis_line_frac"),
      frac(col("n_alpha"), col("n_words")).as("alpha_word_frac"),
      col("stop_hits"))
    val ruled = metrics.select(
      col("*"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .as("r_word_count"),
      (col("n_words") > 0 && col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen).as("r_mean_word_len"),
      (col("symbol_ratio") <= maxSymbolRatio).as("r_symbol_ratio"),
      (col("bullet_line_frac") <= maxBulletLineFrac).as("r_bullet_lines"),
      (col("ellipsis_line_frac") <= maxEllipsisLineFrac).as("r_ellipsis_lines"),
      (col("n_words") > 0 && col("alpha_word_frac") >= minAlphaWordFrac)
        .as("r_alpha_words"),
      (col("stop_hits") >= minStopwordHits).as("r_stop_words"))
    ruled.select(
      col("id").as(idCol),
      col("n_words"), col("mean_word_len"), col("symbol_ratio"),
      col("bullet_line_frac"), col("ellipsis_line_frac"),
      col("alpha_word_frac"), col("stop_hits"),
      col("r_word_count"), col("r_mean_word_len"), col("r_symbol_ratio"),
      col("r_bullet_lines"), col("r_ellipsis_lines"), col("r_alpha_words"),
      col("r_stop_words"),
      (col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
        col("r_bullet_lines") && col("r_ellipsis_lines") &&
        col("r_alpha_words") && col("r_stop_words")).as("pass"))
  }

  /** Confusion matrix — the classifier-vs-label audit every pipeline
    * gate needs once any model-derived column (language guess, quality
    * class, topic) must be trusted against a labeled slice: per
    * (label, prediction) cell, the count, the label-row share (= recall
    * on the diagonal) and the prediction-column share (= precision on
    * the diagonal). NULL labels/predictions are excluded — absence of
    * ground truth is not a class.
    *
    * Cells that never occur emit nothing (a dense label×pred grid is a
    * presentation concern); `correct` marks the diagonal so
    * `sum(n · correct) / sum(n)` is accuracy downstream.
    *
    * Scale shape: ONE corpus aggregation to the cells frame (map-side
    * combined, |labels|·|preds| rows — model-sized); row/column totals
    * are aggregations OF that frame, broadcast back. */
  def confusionMatrix(
      df: DataFrame,
      labelCol: String,
      predCol: String,
      roundTo: Int = 4): DataFrame = {
    val cells = df
      .where(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy("label").agg(sum("n").as("label_total"))
    val colTot = cells.groupBy("pred").agg(sum("n").as("pred_total"))
    cells
      .join(broadcast(rowTot), "label")
      .join(broadcast(colTot), "pred")
      .select(col("label").as(labelCol), col("pred").as(predCol), col("n"),
        round(col("n") * lit(1.0) / col("label_total"), roundTo)
          .as("row_share"),
        round(col("n") * lit(1.0) / col("pred_total"), roundTo)
          .as("col_share"),
        (col("label") === col("pred")).as("correct"))
      .orderBy(labelCol, predCol)
  }

  /** Cohen's kappa — the CHANCE-CORRECTED completion of
    * [[confusionMatrix]]: raw accuracy flatters any classifier on a
    * skewed label mix (predicting the majority class scores high for
    * free); κ = (p_o − p_e)/(1 − p_e) subtracts the agreement two
    * independent raters with these marginals would reach by luck.
    * Output one row: (n, accuracy, expected_agreement, kappa), kappa
    * NULL when p_e = 1 (a single-class degenerate table — undefined,
    * never a fabricated 0 or NaN).
    *
    * Determinism: p_o and p_e are ratios of exact integer sums (the
    * marginal products accumulate in DECIMAL — order-free), the final
    * combination is fixed-order double arithmetic, rounded.
    *
    * Scale shape: one corpus aggregation to the cells frame (the
    * [[confusionMatrix]] shape), then pure arithmetic on model-sized
    * frames. */
  def cohensKappa(
      df: DataFrame,
      labelCol: String,
      predCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 0)
    val cells = df
      .where(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("l"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("l").agg(sum("n").as("nl"))
    val cols_ = cells.groupBy("p").agg(sum("n").as("np"))
    val agree = cells.agg(
      sum(col("n")).as("tot"),
      coalesce(sum(when(col("l") === col("p"), col("n"))), lit(0L)).as("diag"))
    val pe = rows.join(cols_, rows("l") === cols_("p"))
      .agg(coalesce(sum(col("nl").cast(DEC) * col("np").cast(DEC)),
        lit(0).cast(DEC)).as("pesum"))
    agree.crossJoin(broadcast(pe)).select(
      col("tot").as("n"),
      round(col("diag").cast("double") / col("tot"), roundTo).as("accuracy"),
      round(col("pesum").cast("double") /
        (col("tot").cast("double") * col("tot").cast("double")), roundTo)
        .as("expected_agreement"),
      when(col("pesum").cast("double") <
          col("tot").cast("double") * col("tot").cast("double"),
        round(
          (col("diag").cast("double") / col("tot") -
            col("pesum").cast("double") /
              (col("tot").cast("double") * col("tot").cast("double"))) /
            (lit(1.0) - col("pesum").cast("double") /
              (col("tot").cast("double") * col("tot").cast("double"))),
          roundTo)).as("kappa"))
  }

  /** Wilson score interval for a pass RATE — the gate-dashboard CI
    * (Wilson 1927; the standard small-n-safe binomial interval — a
    * plain normal interval collapses to ±0 at k=0 or k=n, exactly where
    * a gate dashboard most needs honesty): for k passes of n at
    * confidence z,
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)`.
    * Returns the (lo, hi) bounds as a 2-element struct-free pair of
    * columns via `wilsonLo`/`wilsonHi` — plain column expressions
    * (sqrt is IEEE-correctly-rounded; callers round the outputs). */
  def wilsonLo(k: Column, n: Column, z: Double = 1.96): Column =
    wilson(k, n, z, -1.0)

  def wilsonHi(k: Column, n: Column, z: Double = 1.96): Column =
    wilson(k, n, z, 1.0)

  private def wilson(k: Column, n: Column, z: Double, sign: Double): Column = {
    val nn = n.cast("double")
    val p = k.cast("double") / nn
    val z2 = z * z
    val center = p + lit(z2) / (lit(2.0) * nn)
    val spread = lit(z) * sqrt(p * (lit(1.0) - p) / nn +
      lit(z2) / (lit(4.0) * nn * nn))
    // FP residue can push the k=0 lower bound a few ulps below zero —
    // clamp into [0,1] (a probability bound, on both engines)
    when(n > 0,
      greatest(lit(0.0), least(lit(1.0),
        (center + lit(sign) * spread) / (lit(1.0) + lit(z2) / nn))))
  }

  /** ROC-AUC via the Mann–Whitney rank statistic — the threshold-free
    * completion of [[confusionMatrix]]/[[cohensKappa]]: those audit a
    * classifier at ONE cut, AUC is P(score(pos) > score(neg)) over every
    * cut (ties count half — the trapezoid/mid-rank convention), the
    * number a gate owner reads before choosing any threshold at all.
    *
    * `scoreCol` must be an INTEGRAL pre-quantized score (the
    * [[graft.operators.Sketches.hdrHistogram]] rule: a double score's
    * tie structure is not portable across engines — quantize with an
    * exact integer expression such as `(en·10⁶) div words` first, which
    * also bounds the distinct-score frame below). NULL labels or scores
    * are excluded; AUC is NULL when either class is empty (undefined,
    * never a fabricated 0.5).
    *
    * Exactness: with nLt_s = negatives scoring strictly below s,
    * 2U = Σ_s nPos_s·(2·nLt_s + nNeg_s) accumulates as an exact
    * decimal integer; auc = 2U / (2·nPos·nNeg) is ONE double division of
    * exact integer operands, rounded. Output one row:
    * (n, n_pos, n_neg, u2, auc).
    *
    * Scale shape: one corpus aggregation to the per-score cells frame
    * (map-side combined, distinct-score-sized — bounded by the caller's
    * quantization, the model-frame contract); the cumulative window and
    * final fold run on that frame, never on corpus rows. */
  def rocAuc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.rocAuc: score column '$scoreCol' must be integral " +
          s"(got $dt) — pre-quantize with an exact integer expression " +
          "whose range BOUNDS the distinct-score frame (e.g. a micro-" +
          "ratio ≤ 10^6): the cumulative rank pass sorts that frame in " +
          "one task, so a raw hash passed as a 'score' is a scale cliff")
    }
    val DEC = DecimalType(38, 0)
    val cells = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos_s"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg_s"))
    // constant-but-unfoldable partition key (the q83 pmod idiom): same
    // single-partition semantics over the model-sized cells frame, but
    // the plan carries a partition spec — the registry lint keeps ZERO
    // bare global windows, so a corpus frame reaching one stays a loud
    // failure elsewhere (a bare lit(0) would constant-fold away)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("s"), lit(1)))
      .orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val u = cells
      .withColumn("n_lt", coalesce(sum(col("n_neg_s")).over(w), lit(0L)))
      .agg(
        coalesce(sum(col("n_pos_s").cast(DEC) *
          (lit(2L).cast(DEC) * col("n_lt").cast(DEC) +
            col("n_neg_s").cast(DEC))), lit(0).cast(DEC)).as("u2"),
        coalesce(sum(col("n_pos_s")), lit(0L)).as("n_pos"),
        coalesce(sum(col("n_neg_s")), lit(0L)).as("n_neg"))
    u.select(
      (col("n_pos") + col("n_neg")).as("n"),
      col("n_pos"), col("n_neg"), col("u2"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")), roundTo)).as("auc"))
  }

  /** Precision–recall curve + average precision — the imbalanced-class
    * companion of [[rocAuc]] (Davis & Goadrich 2006: with rare
    * positives, ROC's false-positive RATE hides a flood of false
    * positives that precision surfaces; the standard gate audit when
    * "positive" is the 1-in-10⁴ quality tier being mined). One row per
    * DISTINCT score threshold (descending blocks — ties enter as a
    * block, the step-AP convention): (score, n_s, pos_s, tp, fp,
    * precision, recall) plus the global `ap` attached to every row
    * (the [[calibrationCurve]] ECE pattern).
    *
    * AP = Σ_s pos_s·P_s / n_pos over thresholds descending — exactness:
    * tp/fp are exact cumulative integers off the cells frame; each term
    * pos_s·tp_s/(tp_s+fp_s) is ONE double division of exact integer
    * operands rounded to 9, summed EXACTLY in decimal (no
    * float-summation order — a windowed double sum would differ between
    * Spark's sequential fold and a segment-tree engine), one final
    * division by n_pos, rounded. AP NULL when no positives (undefined,
    * never 0).
    *
    * `scoreCol` integral pre-quantized (the [[rocAuc]] fail-loud rule —
    * the same quantization that bounds the distinct-score frame).
    *
    * Scale shape: ONE corpus aggregation to the distinct-score cells
    * frame; the cumulative windows and the AP fold run on that
    * model-sized frame under the constant-key partition spec. */
  def prCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.prCurve: score column '$scoreCol' must be integral " +
          s"(got $dt) — pre-quantize with an exact integer expression")
    }
    val cells = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n_s"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("s"), lit(1))).orderBy(col("s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = cells
      .withColumn("tp", sum(col("pos_s")).over(w))
      .withColumn("cumn", sum(col("n_s")).over(w))
      .withColumn("fp", col("cumn") - col("tp"))
      // per-threshold AP term: ONE double division of exact integers,
      // rounded 9, carried as exact decimal for the order-free sum
      .withColumn("term",
        round((col("pos_s") * col("tp")).cast("double") / col("cumn"), 9)
          .cast(DecimalType(38, 9)))
    val tot = cum.agg(
      coalesce(sum(col("n_s")), lit(0L)).as("n"),
      coalesce(sum(col("pos_s")), lit(0L)).as("n_pos"),
      coalesce(sum(col("term")), lit(0).cast(DecimalType(38, 9))).as("ap_num"))
      .select(col("n"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("ap_num").cast("double") / col("n_pos"), roundTo)).as("ap"))
    cum.crossJoin(broadcast(tot))
      .select(col("s").as(scoreCol), col("n_s"), col("pos_s"),
        col("tp"), col("fp"),
        round(col("tp").cast("double") / col("cumn"), roundTo).as("precision"),
        when(col("n_pos") > 0,
          round(col("tp").cast("double") / col("n_pos"), roundTo)).as("recall"),
        col("ap"))
  }

  /** [[rocAuc]] with the Hanley–McNeil (1982) standard error and the
    * 95% Wald interval — the "is this AUC difference real" companion:
    * a gate comparison without an interval over-reads run-to-run noise
    * (the q221 CUPED lesson applied to ranking metrics).
    * SE² = (A(1−A) + (n₊−1)(Q₁−A²) + (n₋−1)(Q₂−A²)) / (n₊·n₋) with
    * Q₁ = A/(2−A), Q₂ = 2A²/(1+A) — derived from the PUBLISHED (rounded)
    * AUC through a fixed-order double chain with one IEEE sqrt (the
    * wilson discipline), so the interval replays exactly. CI clamped to
    * [0, 1]. Output (n, n_pos, n_neg, auc, se, ci_lo, ci_hi); all NULL
    * when AUC is undefined. */
  def rocAucCi(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    val base = rocAuc(df, scoreCol, labelCol, roundTo)
    val A = col("auc")
    val q1 = A / (lit(2.0) - A)
    val q2 = lit(2.0) * A * A / (lit(1.0) + A)
    val se = sqrt((A * (lit(1.0) - A) +
      (col("n_pos") - 1).cast("double") * (q1 - A * A) +
      (col("n_neg") - 1).cast("double") * (q2 - A * A)) /
      (col("n_pos").cast("double") * col("n_neg").cast("double")))
    // explicit NULL guards: greatest/least IGNORE null operands (Spark
    // and DuckDB both), so an undefined AUC would otherwise surface a
    // fabricated [0, 1] interval instead of NULL
    base.select(col("n"), col("n_pos"), col("n_neg"), A,
      round(se, roundTo).as("se"),
      when(A.isNotNull,
        round(greatest(lit(0.0), A - lit(1.96) * se), roundTo)).as("ci_lo"),
      when(A.isNotNull,
        round(least(lit(1.0), A + lit(1.96) * se), roundTo)).as("ci_hi"))
  }

  /** Split-conformal gate threshold (Vovk et al. 2005; the
    * Angelopoulos–Bates 2021 split recipe) — the DISTRIBUTION-FREE way
    * to pick a quality-gate cutoff with a coverage guarantee: every
    * other member of the eval tier AUDITS a score ([[rocAuc]] its
    * ranking, [[calibrationCurve]] its values), THIS turns one into a
    * deployable gate. Choose τ = the k-th smallest calibration GOOD
    * score with k = n + 1 − ⌈(n+1)(1−α)⌉; then for any exchangeable new
    * good row, P(score ≥ τ) ≥ 1 − α — marginal coverage guaranteed by
    * rank exchangeability alone, no distributional assumption, no model
    * of the score. The "keep ≥ (1−α) of good documents" contract a
    * corpus-gate owner actually signs.
    *
    * Exactness: α is the exact rational alphaNum/alphaDen, so
    * k = n + 1 − ((n+1)·(aD−aN) + aD − 1) div aD is pure integer
    * arithmetic (ceil division — no float α anywhere); τ = the minimal
    * distinct score whose cumulative calibration count reaches k (the
    * score column integral pre-quantized, the [[rocAuc]] contract — the
    * cumulative window runs over the distinct-value cells frame, never
    * corpus rows). The held-out readout (empirical coverage on unseen
    * good rows; false-accept rate on unseen bad rows) is exact integer
    * counts with one final division each.
    *
    * Guards: all NULL when k < 1 (calibration set too small for the
    * requested α — the guarantee is unattainable, never fabricated) or
    * when a held-out side is empty (undefined rate, never 0).
    *
    * Scale shape: one pass over the calibration slice to distinct-score
    * cells (map-side combined), one pass over the held-out slice to four
    * int64 counters; the 1-row τ frame attaches by broadcast (the q61
    * one-row class). */
  def conformalGateThreshold(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      calCol: String,
      alphaNum: Int = 1,
      alphaDen: Int = 10,
      roundTo: Int = 6): DataFrame = {
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"conformalGateThreshold: alpha $alphaNum/$alphaDen outside (0, 1)")
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.conformalGateThreshold: score column '$scoreCol' must " +
          s"be integral (got $dt) — pre-quantize with an exact integer " +
          "expression")
    }
    val W = org.apache.spark.sql.expressions.Window
    val base = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
      col(calCol).isNotNull)
    val cells = base.filter(col(calCol) && col(labelCol))
      .groupBy(col(scoreCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = W.partitionBy(pmod(col("v"), lit(1))).orderBy("v")
      .rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.partitionBy(pmod(col("v"), lit(1)))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    // k via exact ceil division; τ = first distinct score reaching k
    val ranked = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_cal", sum(col("c")).over(wAll))
      // DIV, not '/': Spark's '/' on longs is DOUBLE division — the k
      // rule must stay pure integer arithmetic (exact ceil division)
      .withColumn("k", expr(
        s"n_cal + 1 - (((n_cal + 1) * ${alphaDen - alphaNum} + " +
          s"${alphaDen - 1}) DIV ${alphaDen})"))
    val tau = ranked.filter(col("k") >= 1L && col("cum") >= col("k"))
      .agg(min(col("v")).as("tau"), max(col("n_cal")).as("n_cal"),
        max(col("k")).as("k"))
    // empty-calibration / k<1 still needs ONE row out: union the
    // counts-only frame and keep the defined row if any
    val calStats = cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_cal_all"))
    val hold = base.filter(!col(calCol)).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_good"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("n_bad"))
    val heldScored = tau.crossJoin(calStats).crossJoin(hold)
    val holdPass = base.filter(!col(calCol))
      .crossJoin(broadcast(tau.select(col("tau").as("tau_b"))))
      .agg(
        sum(when(col(labelCol) && col(scoreCol) >= col("tau_b"), 1L)
          .otherwise(0L)).as("good_pass"),
        sum(when(!col(labelCol) && col(scoreCol) >= col("tau_b"), 1L)
          .otherwise(0L)).as("bad_pass"))
    val out = heldScored.crossJoin(holdPass)
    out.select(
      col("n_cal_all").as("n_cal"),
      col("k"),
      col("tau"),
      lit(alphaNum).cast("long").as("alpha_num"),
      lit(alphaDen).cast("long").as("alpha_den"),
      col("n_good").as("n_holdout_good"),
      when(col("tau").isNotNull, col("good_pass")).as("good_pass"),
      when(col("tau").isNotNull && col("n_good") > 0,
        round(col("good_pass").cast("double") / col("n_good").cast("double"),
          roundTo)).as("coverage"),
      col("n_bad").as("n_holdout_bad"),
      when(col("tau").isNotNull, col("bad_pass")).as("bad_pass"),
      when(col("tau").isNotNull && col("n_bad") > 0,
        round(col("bad_pass").cast("double") / col("n_bad").cast("double"),
          roundTo)).as("false_accept_rate"))
  }

  /** Two-sample chi-squared homogeneity test over a CATEGORICAL column
    * (Pearson 1900) — the drift-family member for unordered mixes:
    * [[distributionDrift]]'s PSI needs a bin choice, [[ksTest]] needs an
    * ordinal axis; "did the LANGUAGE/SOURCE/TOPIC mix shift between
    * snapshot A and B" is a homogeneity question over categories, and
    * chi-squared is its classical test. For the 2×C table the statistic
    * reduces to ONE sum of exact integer cells:
    *   χ² = Σ_j d_j²/t_j / (n₁·n₂),  d_j = c₁ⱼn₂ − c₂ⱼn₁, t_j = c₁ⱼ+c₂ⱼ
    * (algebraically identical to Σ(obs−exp)²/exp over both rows).
    *
    * Exactness (the [[chiSquaredTerms]] + H.msum discipline): d_j and
    * t_j are exact longs (documented bound n₁·n₂ ≲ 10¹⁵ so d_j² stays
    * inside Decimal(38,6) — 30M rows a side; beyond that pre-aggregate
    * or sample); each per-cell term moves to double AFTER the exact
    * long arithmetic through ONE fixed-order chain, then accumulates as
    * Decimal(38,6) so the cross-cell sum is ORDER-INSENSITIVE (both
    * engines cast identical doubles to identical decimals — no float
    * summation anywhere); χ² is then ONE double division. Significance
    * via the Wilson–Hilferty cube-root normalization (1931) — the
    * standard dof-free normal approximation:
    *   z = ((χ²/k)^⅓ − (1 − 2/(9k))) / √(2/(9k)),  k = dof
    * (cbrt + one sqrt, both IEEE on both engines — the libm
    * discipline); drifted compares the UNROUNDED z to the one-sided
    * normal 95% literal 1.6448536269514722 (the [[mcnemar]] rule).
    *
    * Guards: all test columns NULL when either side is empty or dof = 0
    * (a single shared category carries no homogeneity evidence).
    *
    * Scale shape: one corpus pass to (category, c₁, c₂) cells (map-side
    * combined, category-bounded), one model-frame reduction — the
    * [[ksTest]] shape with no ordering requirement. */
  def chiSquaredDrift(
      df: DataFrame,
      catCol: String,
      sideCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 6)
    val cells = df
      .where(col(catCol).isNotNull && col(sideCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("c2"))
    val tots = cells.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2"))
    // d, t exact longs; the per-cell term moves to double AFTER the
    // exact arithmetic (one fixed-order chain) and accumulates as
    // decimal — the one-row totals frame broadcasts onto the
    // category-bounded cells
    val termed = cells.crossJoin(broadcast(tots))
      .withColumn("d", col("c1") * col("n2") - col("c2") * col("n1"))
      .withColumn("term",
        (col("d").cast("double") * col("d").cast("double") /
          (col("c1") + col("c2")).cast("double")).cast(DEC))
    val agg = termed.agg(
      coalesce(sum(col("term")), lit(0).cast(DEC)).as("tsum"),
      count(lit(1)).as("cats"),
      max(col("n1")).as("n1"), max(col("n2")).as("n2"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val chi2 = col("tsum").cast("double") / (n1d * n2d)
    val k = (col("cats") - 1L).cast("double")
    val zWh = (cbrt(chi2 / k) - (lit(1.0) - lit(2.0) / (lit(9.0) * k))) /
      sqrt(lit(2.0) / (lit(9.0) * k))
    val tested = col("n1") > 0L && col("n2") > 0L && col("cats") > 1L
    // one-sided normal 95% point (chi-squared is an upper-tail test)
    val crit = lit(1.6448536269514722)
    agg.select(
      col("n1"), col("n2"), col("cats").as("categories"),
      when(tested, round(chi2, roundTo)).as("chi2"),
      when(tested, col("cats") - 1L).as("dof"),
      when(tested, round(zWh, roundTo)).as("z_wh"),
      when(tested, zWh > crit).as("drifted"))
  }

  /** Per-category drift LOCALIZATION for the 2×C homogeneity setting —
    * the follow-up question [[chiSquaredDrift]] leaves open: the global
    * χ² says THE MIX SHIFTED, this says WHICH categories moved and by
    * how much. Two readouts per category:
    *
    *  - Haberman's adjusted standardized residual (Haberman 1973):
    *    r_j = (c₁ⱼ − e₁ⱼ) / √(e₁ⱼ·(1 − n₁/N)·(1 − t_j/N)), which for
    *    the 2×C table reduces to the exact-integer-numerator form
    *    r_j = d_j / √((n₁·n₂)·(t_j·(N−t_j)) / N) with d_j = c₁ⱼn₂ −
    *    c₂ⱼn₁ (the SAME exact d as the global test) — asymptotically
    *    N(0,1) under homogeneity, so |r| > 1.96 flags the category
    *    (UNADJUSTED for multiplicity — documented; feed the residuals
    *    to [[bhFdr]] when C is large and false flags are costly);
    *  - the category's χ² share: term_j / Σterm — "what fraction of
    *    the total drift signal this category carries".
    *
    * Plus Cramér's V (Cramér 1946) attached to every row — the global
    * EFFECT SIZE the χ² statistic itself is not (χ² grows linearly in N
    * at fixed mix shift; V = √(χ²/N) for the 2×C table is
    * N-free, the "is it big" to [[chiSquaredDrift]]'s "is it real").
    *
    * Exactness: d_j, t_j exact longs (the documented n₁·n₂ ≲ 10¹⁵
    * bound); every double derives from exact longs through ONE
    * fixed-order chain (two float products, one division, one IEEE
    * sqrt for the residual); χ² terms decimal-accumulate exactly as in
    * [[chiSquaredDrift]]. Guards: all columns except the raw counts
    * NULL when either side is empty or C < 2 (no homogeneity question);
    * `moved` compares the UNROUNDED |r| to the two-sided normal 95%
    * literal 1.959963984540054.
    *
    * Scale shape: identical to [[chiSquaredDrift]] — one corpus pass to
    * category-bounded cells, one model-frame reduction broadcast back
    * onto the cells (the q61 one-row class). Output one row per
    * category. */
  def chiSquaredResiduals(
      df: DataFrame,
      catCol: String,
      sideCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 6)
    val cells = df
      .where(col(catCol).isNotNull && col(sideCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("c2"))
    val tots = cells.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2"),
      count(lit(1)).as("cats"))
    val termed = cells.crossJoin(broadcast(tots))
      .withColumn("t_j", col("c1") + col("c2"))
      .withColumn("d", col("c1") * col("n2") - col("c2") * col("n1"))
      .withColumn("term",
        (col("d").cast("double") * col("d").cast("double") /
          col("t_j").cast("double")).cast(DEC))
    val glob = termed.agg(
      coalesce(sum(col("term")), lit(0).cast(DEC)).as("tsum"),
      max(col("n1")).as("n1g"), max(col("n2")).as("n2g"),
      max(col("cats")).as("catsg"))
    val out = termed.crossJoin(broadcast(glob))
    val nTot = (col("n1") + col("n2")).cast("double")
    // r = d / sqrt((n1·n2)·(t·(N−t)) / N): one fixed-order chain
    val resid = col("d").cast("double") /
      sqrt(col("n1").cast("double") * col("n2").cast("double") *
        (col("t_j").cast("double") *
          (nTot - col("t_j").cast("double"))) / nTot)
    val chi2 = col("tsum").cast("double") /
      (col("n1").cast("double") * col("n2").cast("double"))
    val vCramer = sqrt(chi2 / nTot)
    val tested = col("n1") > 0L && col("n2") > 0L && col("cats") > 1L
    val crit = lit(1.959963984540054)
    out.select(
      col("cat").as(catCol),
      col("c1"), col("c2"), col("d"),
      when(tested, round(resid, roundTo)).as("adj_residual"),
      when(tested, abs(resid) > crit).as("moved"),
      when(tested && col("tsum") > 0,
        round(col("term").cast("double") / col("tsum").cast("double"),
          roundTo)).as("chi2_share"),
      when(tested, round(vCramer, roundTo)).as("cramers_v"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 association test + the
    * Mantel–Haenszel pooled odds ratio (Cochran 1954; Mantel & Haenszel
    * 1959) — the CONFOUNDER-ADJUSTED member of the categorical family:
    * [[chiSquaredDrift]] tests a marginal association, which Simpson's
    * paradox can fabricate or hide whenever a stratum variable (source,
    * language, time) correlates with both sides; CMH tests the
    * exposure↔outcome association WITHIN each stratum and pools the
    * evidence — "did the gate's pass rate really differ by variant,
    * controlling for source", the question a marginal 2×2 cannot
    * answer. The same hypergeometric machinery as [[graft.operators
    * .Survival.logRank]] (which is CMH over risk sets — the family
    * resemblance is the math).
    *
    * Math per stratum k (a=exposed-positive, r1=exposed, c1=positive,
    * n=total): O−E term a_k − r1·c1/n with EXACT long numerator
    * a·n − r1·c1 and ONE division; variance term r1·r2·c1·c2/(n²(n−1))
    * one fixed-order chain (n ≤ 1 strata carry none); MH odds ratio
    * OR = Σ(a·d/n) / Σ(b·c/n) with exact-long product numerators. All
    * per-stratum terms accumulate as Decimal(38,12) — order-insensitive
    * (documented per-stratum n ≲ 10⁹ for the exact numerators).
    *
    * Guards: z/chi2/significant NULL at ΣV = 0 (no informative
    * stratum); or_mh/log_or NULL when either Σ(a·d/n) or Σ(b·c/n) is 0
    * (a zero margin somewhere — the classic add-0.5 corrections are
    * deliberately NOT applied; surface the degenerate table, never a
    * smoothed number). `significant` compares the UNROUNDED |z| to the
    * two-sided normal 95% literal (the [[mcnemar]] rule).
    *
    * Scale shape: ONE corpus pass to per-stratum (a, b, c, d) cells
    * (stratum-bounded, map-side combined), one model-frame reduction.
    * Output ONE row: (strata, n, n_exposed, n_positive, o_minus_e,
    * var_cmh, z, chi2, significant, or_mh, log_or). */
  def cmhTest(
      df: DataFrame,
      stratumCol: String,
      exposureCol: String,
      outcomeCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val DEC = DecimalType(38, 12)
    val cells = df
      .where(col(stratumCol).isNotNull && col(exposureCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .groupBy(col(stratumCol).as("k"))
      .agg(
        sum(when(col(exposureCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("a"),
        sum(when(col(exposureCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col(exposureCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("c"),
        sum(when(!col(exposureCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("d"))
    val n = col("a") + col("b") + col("c") + col("d")
    val r1 = col("a") + col("b")
    val r2 = col("c") + col("d")
    val c1 = col("a") + col("c")
    val c2 = col("b") + col("d")
    val nD = n.cast(DoubleType)
    // O−E: exact long numerator, one division; variance: one chain
    val oeTerm = ((col("a") * n - r1 * c1).cast(DoubleType) / nD).cast(DEC)
    val vTerm = when(n > 1L,
      (r1.cast(DoubleType) * c1.cast(DoubleType) / nD) *
        (r2.cast(DoubleType) / nD) *
        (c2.cast(DoubleType) / (nD - lit(1.0)))).otherwise(lit(0.0)).cast(DEC)
    val adTerm = ((col("a") * col("d")).cast(DoubleType) / nD).cast(DEC)
    val bcTerm = ((col("b") * col("c")).cast(DoubleType) / nD).cast(DEC)
    val agg = cells.agg(
      count(lit(1)).as("strata"),
      coalesce(sum(n), lit(0L)).as("n"),
      coalesce(sum(r1), lit(0L)).as("n_exposed"),
      coalesce(sum(c1), lit(0L)).as("n_positive"),
      coalesce(sum(oeTerm), lit(0).cast(DEC)).as("oe_d"),
      coalesce(sum(vTerm), lit(0).cast(DEC)).as("v_d"),
      coalesce(sum(adTerm), lit(0).cast(DEC)).as("ad_d"),
      coalesce(sum(bcTerm), lit(0).cast(DEC)).as("bc_d"))
    val oeD = col("oe_d").cast(DoubleType)
    val vD = col("v_d").cast(DoubleType)
    val z = oeD / sqrt(vD)
    val orMh = col("ad_d").cast(DoubleType) / col("bc_d").cast(DoubleType)
    val crit = lit(1.959963984540054)
    agg.select(
      col("strata"), col("n"), col("n_exposed"), col("n_positive"),
      round(oeD, roundTo).as("o_minus_e"),
      round(vD, roundTo).as("var_cmh"),
      when(col("v_d") > 0, round(z, roundTo)).as("z"),
      when(col("v_d") > 0, round(z * z, roundTo)).as("chi2"),
      when(col("v_d") > 0, abs(z) > crit).as("significant"),
      when(col("ad_d") > 0 && col("bc_d") > 0, round(orMh, roundTo))
        .as("or_mh"),
      when(col("ad_d") > 0 && col("bc_d") > 0, round(log(orMh), roundTo))
        .as("log_or"))
  }

  /** Jensen–Shannon divergence between two snapshots' CATEGORICAL mixes
    * (Lin 1991; the √JSD metric of Endres & Schindelin 2003) — the
    * BOUNDED-MEASURE member of the drift family: [[chiSquaredDrift]]
    * answers "is the shift real" (grows with N at fixed shift),
    * [[chiSquaredResiduals]]' Cramér's V sizes it against its maximum,
    * THIS is the information-theoretic distance dashboards threshold on
    * — symmetric, finite on zero cells (where KL and PSI blow up or
    * need smoothing), JSD ∈ [0, ln 2] with √(JSD/ln 2) ∈ [0, 1] a true
    * metric. The standard corpus-mix drift score between training
    * snapshots.
    *
    * Math: with p_j = c₁ⱼ/n₁, q_j = c₂ⱼ/n₂ and m = (p+q)/2,
    * JSD = ½KL(p‖m) + ½KL(q‖m) = Σ_j [½p_j·ln(2p_j/(p_j+q_j)) +
    * ½q_j·ln(2q_j/(p_j+q_j))], a zero count contributing exactly 0 to
    * its half (lim x→0 x·ln x = 0 — made explicit, never NaN).
    *
    * Exactness: counts exact longs off one corpus pass; p_j/q_j are
    * single divisions of exact longs; each half-term is ONE fixed-order
    * double chain with one ln (the libm discipline) accumulating as
    * Decimal(38,12) — cross-category sums ORDER-INSENSITIVE; the
    * normalizations divide by the ln 2 literal 0.6931471805599453 with
    * one IEEE sqrt for the distance. Guards: all divergence columns
    * NULL when either side is empty (no comparison — never a fabricated
    * 0). There is deliberately NO significance flag: JSD's null
    * distribution is not distribution-free — [[chiSquaredDrift]] is the
    * TEST, this is the MEASURE (documented division of labor).
    *
    * Scale shape: identical to [[chiSquaredDrift]] — one corpus pass to
    * category-bounded (c₁, c₂) cells, one model-frame reduction. Output
    * ONE row: (n1, n2, categories, jsd, jsd_norm, js_dist). */
  def jensenShannonDrift(
      df: DataFrame,
      catCol: String,
      sideCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 12)
    val cells = df
      .where(col(catCol).isNotNull && col(sideCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("c2"))
    val tots = cells.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2"))
    // guarded against the empty-side case (outputs are NULL there anyway;
    // ANSI mode would otherwise raise on the 0-divisor) — identical
    // doubles to the bare division whenever the side is non-empty
    val p = when(col("n1") > 0L,
      col("c1").cast("double") / col("n1").cast("double")).otherwise(lit(0.0))
    val q = when(col("n2") > 0L,
      col("c2").cast("double") / col("n2").cast("double")).otherwise(lit(0.0))
    // each half-term exactly 0 at a zero count (x·ln x → 0 made explicit)
    val half1 = when(col("c1") > 0L,
      lit(0.5) * p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0))
    val half2 = when(col("c2") > 0L,
      lit(0.5) * q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))
    val agg = cells.crossJoin(broadcast(tots))
      .agg(
        coalesce(sum((half1 + half2).cast(DEC)), lit(0).cast(DEC)).as("jsd_d"),
        count(lit(1)).as("cats"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
    val ln2 = lit(0.6931471805599453)
    // the half-terms are individually signed (only their SUM is ≥ 0), so
    // a mathematically-zero JSD can land at −1e−12 in the decimal sum —
    // clamp at 0 before the ratio/sqrt (never a NaN distance)
    val jsdD = greatest(col("jsd_d").cast("double"), lit(0.0))
    val tested = col("n1") > 0L && col("n2") > 0L
    agg.select(
      col("n1"), col("n2"), col("cats").as("categories"),
      when(tested, round(jsdD, roundTo)).as("jsd"),
      when(tested, round(jsdD / ln2, roundTo)).as("jsd_norm"),
      when(tested, round(sqrt(jsdD / ln2), roundTo)).as("js_dist"))
  }

  /** Mutual information between two CATEGORICAL columns (Shannon 1948;
    * the NMI normalization of Strehl & Ghosh 2002) — the ASSOCIATION
    * member of the categorical family: [[chiSquaredDrift]] tests the
    * same mix across two SNAPSHOTS, this measures how strongly two
    * ATTRIBUTES of one corpus determine each other (source↔language,
    * topic↔license, cluster↔label), the quantity behind "is this
    * metadata column redundant", stratification design, and the
    * cluster-vs-label agreement score. MI = Σ_cells (c/N)·ln(N·c /
    * (r_a·c_b)) in nats; NMI = MI / √(H(A)·H(B)) ∈ [0,1] (the
    * symmetric geometric-mean normalization).
    *
    * Exactness: all counts exact longs off ONE corpus pass; every
    * per-cell/per-marginal term derives from exact longs through ONE
    * fixed-order double chain (one ln each — the libm discipline) and
    * accumulates as Decimal(38,12) so the cross-cell sums are
    * ORDER-INSENSITIVE (the [[chiSquaredDrift]] term discipline at the
    * precision MI's small magnitudes need); a cell with c·N = r_a·c_b
    * contributes exactly ln(1) = 0. Guards: H/MI NULL when N = 0; NMI
    * additionally NULL when either entropy is 0 (a constant column
    * carries no information to normalize by — never a fabricated 0/0).
    *
    * Scale shape: one corpus pass to (a, b) joint cells (map-side
    * combined, category-bounded); marginals are cells-frame
    * re-aggregations; everything after is model-frame equi-joins plus
    * 1-row reductions (the q61 crossJoin class). Output ONE row:
    * (n, n_cells, n_a, n_b, h_a, h_b, mi, nmi). */
  def mutualInfoCategorical(
      df: DataFrame,
      aCol: String,
      bCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val DEC = DecimalType(38, 12)
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val ra = cells.groupBy("a").agg(sum(col("c")).as("ra"))
    val cb = cells.groupBy("b").agg(sum(col("c")).as("cb"))
    val tot = cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      count(lit(1)).as("n_cells"))
    val nD = col("n").cast("double")
    // per-cell MI term: (c/N)·ln(N·c/(ra·cb)) — one fixed-order chain
    val miTerm = ((col("c").cast("double") / nD) *
      log((nD * col("c").cast("double")) /
        (col("ra").cast("double") * col("cb").cast("double")))).cast(DEC)
    val mi = cells.join(ra, "a").join(cb, "b").crossJoin(broadcast(tot))
      .agg(coalesce(sum(miTerm), lit(0).cast(DEC)).as("mi_d"))
    // marginal entropies: Σ (m/N)·ln(N/m), decimal-accumulated
    def entropyOf(marg: DataFrame, mCol: String, outCol: String,
        cntCol: String) = {
      val hTerm = ((col(mCol).cast("double") / nD) *
        log(nD / col(mCol).cast("double"))).cast(DEC)
      marg.crossJoin(broadcast(tot))
        .agg(coalesce(sum(hTerm), lit(0).cast(DEC)).as(outCol),
          count(lit(1)).as(cntCol))
    }
    val ha = entropyOf(ra, "ra", "ha_d", "n_a")
    val hb = entropyOf(cb, "cb", "hb_d", "n_b")
    val out = tot.crossJoin(broadcast(mi))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
    val haD = col("ha_d").cast("double")
    val hbD = col("hb_d").cast("double")
    val miD = col("mi_d").cast("double")
    out.select(
      col("n"), col("n_cells"), col("n_a"), col("n_b"),
      when(col("n") > 0L, round(haD, roundTo)).as("h_a"),
      when(col("n") > 0L, round(hbD, roundTo)).as("h_b"),
      when(col("n") > 0L, round(miD, roundTo)).as("mi"),
      when(col("n") > 0L && col("ha_d") > 0 && col("hb_d") > 0,
        round(miD / sqrt(haD * hbD), roundTo)).as("nmi"))
  }

  /** DeLong paired ROC-AUC comparison (DeLong, DeLong & Clarke-Pearson
    * 1988) — the RANKING-level companion of [[mcnemar]]: McNemar asks
    * whether gate B's thresholded DECISIONS beat gate A's on the same
    * rows, THIS asks whether gate B's score RANKS the same labels better
    * than gate A's, before any threshold is chosen — the question every
    * scorer swap asks of its AUCs. [[rocAucCi]]'s Hanley–McNeil interval
    * treats each AUC alone; on the SAME rows the two AUCs are strongly
    * correlated and the unpaired comparison over-states the noise —
    * DeLong's placement-covariance structural components price exactly
    * that correlation.
    *
    * Math (placements in half-units so everything before the final
    * divisions is an exact integer): for a positive row with score s,
    * Xn(s) = 2·(#neg below s) + (#neg tied at s) ∈ [0, 2n₋], the row's
    * placement V = Xn/(2n₋); for a negative row, Yn(s) = 2·(#pos above)
    * + (#pos tied), W = Yn/(2n₊). AUC = mean V = mean W. With exact
    * integer moments S• = Σ c·Xn• and T• = Σ c·Yn• over the positive /
    * negative (sa, sb) joint cells:
    *   S10_xy = (Sxy − Sx·Sy/n₊) / (n₊−1) / (4n₋²)   (positive-side cov)
    *   S01_xy = (Txy − Tx·Ty/n₋) / (n₋−1) / (4n₊²)   (negative-side cov)
    *   Var(Δ) = (S10_aa + S10_bb − 2·S10_ab)/n₊
    *          + (S01_aa + S01_bb − 2·S01_ab)/n₋
    *   z = (AUC_a − AUC_b)/√Var(Δ), two-sided at the normal 97.5% point
    *   1.959963984540054 (literal, the [[ksTest]] 1.358 discipline).
    *
    * Exactness: both scores integral pre-quantized (the [[rocAuc]]
    * contract — the per-axis placement frames are distinct-value-sized
    * and their cumulative windows run over bounded cells, never corpus
    * rows); the moment sums accumulate as Decimal(38,0) — documented
    * bound n₊·n₋ ≲ 10¹⁸ for the exact path (the d_num class); every
    * double derives from exact integers through ONE fixed-order chain
    * with one IEEE sqrt, mirrored verbatim in the SQL replay.
    *
    * Guards: all test columns NULL when n₊ < 2 or n₋ < 2 (a covariance
    * needs two placements per side); z/significant additionally NULL
    * when Var(Δ) = 0 (identical rankings — no evidence either way,
    * never a fabricated z = 0).
    *
    * Scale shape: one corpus pass → positive / negative joint (sa, sb)
    * cells (map-side combined, corpus-bounded); placements attach by
    * per-axis equi-joins against distinct-value frames; six Decimal
    * moments per side reduce to ONE row each; everything after is a
    * 1-row projection (the crossJoin is the q61 one-row class). */
  def delongAucCompare(
      df: DataFrame,
      scoreACol: String,
      scoreBCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Seq(scoreACol, scoreBCol).foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ByteType
           | _: org.apache.spark.sql.types.ShortType
           | _: org.apache.spark.sql.types.IntegerType
           | _: org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"Quality.delongAucCompare: score column '$c' must be integral " +
            s"(got $dt) — pre-quantize with an exact integer expression")
      }
    }
    val DEC = DecimalType(38, 0)
    val W = org.apache.spark.sql.expressions.Window
    val base = df
      .where(col(scoreACol).isNotNull && col(scoreBCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(scoreACol).as("sa"), col(scoreBCol).as("sb"),
        col(labelCol).as("y"))
    val posCells = base.filter(col("y")).groupBy("sa", "sb")
      .agg(count(lit(1)).as("c"))
    val negCells = base.filter(!col("y")).groupBy("sa", "sb")
      .agg(count(lit(1)).as("c"))
    // per-axis placement tables over the MERGED distinct values of that
    // axis (a positive's score may not occur among negatives): Xn vs the
    // negative counts in ascending order, Yn vs the positive counts in
    // descending order — both windows run over distinct-value frames
    // bounded by the caller's quantization, keyed by the pmod idiom
    def placements(axis: String, other: DataFrame, ownCells: DataFrame,
        desc: Boolean, outName: String): DataFrame = {
      val oc = other.groupBy(col(axis).as("v")).agg(sum(col("c")).as("cnt"))
      val vals = ownCells.select(col(axis).as("v"))
        .union(oc.select(col("v"))).distinct()
      val ord = if (desc) col("v").desc else col("v").asc
      val w = W.partitionBy(pmod(col("v"), lit(1))).orderBy(ord)
        .rowsBetween(W.unboundedPreceding, -1)
      vals.join(oc, Seq("v"), "left")
        .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
        .withColumn(outName,
          lit(2L) * coalesce(sum(col("cnt0")).over(w), lit(0L)) + col("cnt0"))
        .select(col("v").as(axis), col(outName))
    }
    def moments(cells: DataFrame, xa: DataFrame, xb: DataFrame,
        p: String): DataFrame =
      cells.join(xa, "sa").join(xb, "sb")
        .agg(coalesce(sum(col("c")), lit(0L)).as(s"${p}n"),
          coalesce(sum(col("c").cast(DEC) * col("xna").cast(DEC)), lit(0).cast(DEC)).as(s"${p}a"),
          coalesce(sum(col("c").cast(DEC) * col("xnb").cast(DEC)), lit(0).cast(DEC)).as(s"${p}b"),
          coalesce(sum(col("c").cast(DEC) * col("xna").cast(DEC) * col("xna").cast(DEC)), lit(0).cast(DEC)).as(s"${p}aa"),
          coalesce(sum(col("c").cast(DEC) * col("xnb").cast(DEC) * col("xnb").cast(DEC)), lit(0).cast(DEC)).as(s"${p}bb"),
          coalesce(sum(col("c").cast(DEC) * col("xna").cast(DEC) * col("xnb").cast(DEC)), lit(0).cast(DEC)).as(s"${p}ab"))
    val pos = moments(posCells,
      placements("sa", negCells, posCells, desc = false, "xna"),
      placements("sb", negCells, posCells, desc = false, "xnb"), "s")
    val neg = moments(negCells,
      placements("sa", posCells, negCells, desc = true, "xna"),
      placements("sb", posCells, negCells, desc = true, "xnb"), "t")
    val j = pos.crossJoin(neg) // two 1-row frames — the q61 one-row class
    val np = col("sn").cast("double")
    val nn = col("tn").cast("double")
    val aucA = col("sa2").cast("double") / (lit(2.0) * np * nn)
    val aucB = col("sb2").cast("double") / (lit(2.0) * np * nn)
    def cov10(xy: Column, x: Column, y: Column) =
      (xy.cast("double") - x.cast("double") * y.cast("double") / np) /
        (np - lit(1.0)) / (lit(4.0) * nn * nn)
    def cov01(xy: Column, x: Column, y: Column) =
      (xy.cast("double") - x.cast("double") * y.cast("double") / nn) /
        (nn - lit(1.0)) / (lit(4.0) * np * np)
    val named = j.select(col("sn"), col("tn"),
      col("sa").as("sa2"), col("sb").as("sb2"),
      col("saa"), col("sbb"), col("sab"),
      col("ta").as("ta2"), col("tb").as("tb2"),
      col("taa"), col("tbb"), col("tab"))
    val varD =
      (cov10(col("saa"), col("sa2"), col("sa2")) +
        cov10(col("sbb"), col("sb2"), col("sb2")) -
        lit(2.0) * cov10(col("sab"), col("sa2"), col("sb2"))) / np +
      (cov01(col("taa"), col("ta2"), col("ta2")) +
        cov01(col("tbb"), col("tb2"), col("tb2")) -
        lit(2.0) * cov01(col("tab"), col("ta2"), col("tb2"))) / nn
    val se = sqrt(varD)
    val z = (aucA - aucB) / se
    val tested = col("sn") >= 2L && col("tn") >= 2L
    val zDefined = tested && varD > 0.0
    // normal two-sided 5% point (the mcnemar full-digit literal rule)
    val crit = lit(1.959963984540054)
    named.select(
      (col("sn") + col("tn")).as("n"),
      col("sn").as("n_pos"), col("tn").as("n_neg"),
      when(tested, round(aucA, roundTo)).as("auc_a"),
      when(tested, round(aucB, roundTo)).as("auc_b"),
      when(tested, round(aucA - aucB, roundTo)).as("delta"),
      when(tested, round(se, roundTo)).as("se_delta"),
      when(zDefined, round(z, roundTo)).as("z"),
      when(zDefined, aucA > aucB).as("a_better"),
      when(zDefined, abs(z) > crit).as("significant"))
  }

  /** Two-sample Kolmogorov–Smirnov distance (Kolmogorov 1933 / Smirnov
    * 1939) between a score's distributions on two sides of a boolean
    * split — the BINLESS member of the drift family:
    * [[distributionDrift]]'s PSI needs a bin choice and saturates on
    * empty bins, the KS statistic is the exact sup-distance
    * D = max_v |F₁(v) − F₂(v)| over the merged support, computed here as
    * an EXACT integer maximum: D = max |C₁·n₂ − C₂·n₁| / (n₁·n₂) with
    * cumulative counts C — no floats until the final division, so the
    * statistic is engine-exact at any scale. Also emitted: the α = 0.05
    * asymptotic critical value c(α)·√((n₁+n₂)/(n₁·n₂)) (c = 1.358, the
    * standard two-sided constant; one sqrt + divisions — the wilson
    * libm discipline) and the drifted flag D > crit.
    *
    * `valueCol` integral pre-quantized (the [[rocAuc]] rule — the
    * quantization bounds the distinct-value cells frame). Output one
    * row: (n1, n2, d_num, d, crit, drifted); d_num = the exact integer
    * max |C₁·n₂ − C₂·n₁| (documented bound n₁·n₂ < 2⁶³). NULL
    * d/crit/drifted when either side is empty (undefined, never 0). */
  def ksTest(
      df: DataFrame,
      valueCol: String,
      sideCol: String,
      roundTo: Int = 6): DataFrame = {
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.ksTest: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize with an exact integer expression")
    }
    val W = org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(valueCol).isNotNull && col(sideCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("c2"))
    val wCum = W.partitionBy(pmod(col("v"), lit(1))).orderBy("v")
      .rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.partitionBy(pmod(col("v"), lit(1)))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val cum = cells
      .withColumn("cc1", sum(col("c1")).over(wCum))
      .withColumn("cc2", sum(col("c2")).over(wCum))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .withColumn("dn", abs(col("cc1") * col("n2") - col("cc2") * col("n1")))
    val st = cum.agg(
      coalesce(max(col("n1")), lit(0L)).as("n1"),
      coalesce(max(col("n2")), lit(0L)).as("n2"),
      coalesce(max(col("dn")), lit(0L)).as("d_num"))
    // compare the UNROUNDED doubles (both engines derive them from the
    // same exact integers through identical op chains), round on output
    val dRaw = col("d_num").cast("double") /
      (col("n1").cast("double") * col("n2").cast("double"))
    val critRaw = lit(1.358) * sqrt(
      (col("n1") + col("n2")).cast("double") /
        (col("n1").cast("double") * col("n2").cast("double")))
    st.select(
      col("n1"), col("n2"), col("d_num"),
      when(col("n1") > 0 && col("n2") > 0, round(dRaw, roundTo)).as("d"),
      when(col("n1") > 0 && col("n2") > 0, round(critRaw, roundTo)).as("crit"),
      when(col("n1") > 0 && col("n2") > 0, dRaw > critRaw).as("drifted"))
  }

  /** McNemar's test on paired classifier decisions (McNemar 1947) — the
    * DIRECTIONAL companion of [[cohensKappa]]: kappa says whether two
    * gates agree, THIS says whether gate B is actually BETTER than gate
    * A against the same truth on the same rows — the question every
    * threshold/model swap asks before shipping. Accuracy deltas on the
    * same corpus are paired, so the only information is in the
    * DISCORDANT cells: b01 = rows A got wrong and B got right, b10 =
    * the reverse; under H0 (equal error rates) their split is
    * Binomial(b01+b10, 1/2), and χ² = (b01−b10)²/(b01+b10) is the
    * large-sample test (the continuity-corrected form also emitted).
    *
    * Exactness: b01/b10 are exact integer sums from ONE corpus
    * aggregation (map-side combined, four counters out); each statistic
    * is ONE double division of exact integers; `significant` compares
    * the UNROUNDED χ² to the α = 0.05, df = 1 critical value 3.8414588
    * as a literal (the [[ksTest]] 1.358 discipline — both engines
    * compare identical doubles to the identical literal). All test
    * columns NULL when b01 + b10 = 0 (no discordant evidence —
    * undefined, never a fabricated 0).
    *
    * Scale shape: one narrow corpus aggregation to four int64 counters;
    * everything after is a 1-row projection. */
  def mcnemar(
      df: DataFrame,
      truthCol: String,
      aCol: String,
      bCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val aOk = col(aCol) === col(truthCol)
    val bOk = col(bCol) === col(truthCol)
    val agg = df
      .where(col(truthCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(!aOk && bOk, 1L).otherwise(0L)).as("b01"),
        sum(when(aOk && !bOk, 1L).otherwise(0L)).as("b10"))
    val nd = (col("b01") + col("b10")).cast(DoubleType)
    val d = (col("b01") - col("b10")).cast(DoubleType)
    val stat = (d * d) / nd
    val cc = greatest(abs(col("b01") - col("b10")) - lit(1L), lit(0L))
      .cast(DoubleType)
    val statCc = (cc * cc) / nd
    val tested = (col("b01") + col("b10")) > 0L
    // chi-squared df=1 upper 5% point (Abramowitz & Stegun table 26.8)
    val crit = lit(3.841458820694124)
    agg.select(col("n"), col("b01"), col("b10"),
      when(tested, round(stat, roundTo)).as("mcnemar"),
      when(tested, round(statCc, roundTo)).as("mcnemar_cc"),
      when(tested, col("b01") > col("b10")).as("b_better"),
      when(tested, stat > crit).as("significant"))
  }

  /** Per-SEGMENT two-sample Kolmogorov–Smirnov distance — [[ksTest]]'s
    * exact cumulative-cells arithmetic GROUPED by a segment column (the
    * [[rocAucBy]] pattern): "which sources/domains/shards actually
    * drifted", the question a single corpus-wide D hides exactly the
    * way a global AUC hides a bad segment. Cumulative windows partition
    * BY SEGMENT — real parallelism, segments rank independently across
    * the cluster, no constant-key frame.
    *
    * Also emits `p_micro`: the asymptotic two-sided tail bound
    * p = min(1, 2·exp(−2·n_e·D²)) (Smirnov's limit; n_e = n1n2/(n1+n2))
    * as an integral micro-probability round(p·10⁶) — n_e·D² =
    * d_num²/(n1·n2·(n1+n2)) derives from the exact integers through a
    * fixed-order double chain with ONE exp (the micro-nat quantization
    * rule, q205/L36 family), so the column feeds [[bhFdr]] directly.
    * Single-sided segments emit NULL d/crit/drifted/p_micro (undefined,
    * never a fabricated 0), and the `drifted` flag compares the
    * UNROUNDED doubles (the [[ksTest]] contract).
    *
    * Scale shape: ONE corpus aggregation to the (segment × distinct
    * value) cells frame (bounded by the caller's quantization per the
    * integral-value fail-loud rule), segment-keyed windows, one row per
    * segment out. */
  def ksTestBy(
      df: DataFrame,
      segmentCol: String,
      valueCol: String,
      sideCol: String,
      roundTo: Int = 6): DataFrame = {
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.ksTestBy: value column '$valueCol' must be integral " +
          s"(got $dt) — pre-quantize with an exact integer expression")
    }
    val W = org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(valueCol).isNotNull && col(sideCol).isNotNull &&
        col(segmentCol).isNotNull)
      .groupBy(col(segmentCol).as("segment"), col(valueCol).as("v"))
      .agg(sum(when(col(sideCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol), 0L).otherwise(1L)).as("c2"))
    val wCum = W.partitionBy("segment").orderBy("v")
      .rowsBetween(W.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cc1", sum(col("c1")).over(wCum))
      .withColumn("cc2", sum(col("c2")).over(wCum))
    // the max over |cc1·n2 − cc2·n1| needs per-segment totals first:
    // totals frame joined back on the segment key, then the exact max
    val tot = cells.groupBy("segment").agg(
      sum(col("c1")).cast(LongType).as("n1"),
      sum(col("c2")).cast(LongType).as("n2"))
    val dnum = cum.join(tot, "segment")
      .groupBy("segment", "n1", "n2")
      .agg(coalesce(max(abs(col("cc1") * col("n2") - col("cc2") * col("n1"))),
        lit(0L)).as("d_num"))
    import org.apache.spark.sql.types.DoubleType
    val dRaw = col("d_num").cast(DoubleType) /
      (col("n1").cast(DoubleType) * col("n2").cast(DoubleType))
    val critRaw = lit(1.358) * sqrt(
      (col("n1") + col("n2")).cast(DoubleType) /
        (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)))
    val dd = col("d_num").cast(DoubleType)
    val pRaw = lit(2.0) * exp(lit(-2.0) *
      ((dd * dd) / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType) *
        (col("n1") + col("n2")).cast(DoubleType))))
    val twoSided = col("n1") > 0L && col("n2") > 0L
    dnum.select(
      col("segment").as(segmentCol), col("n1"), col("n2"), col("d_num"),
      when(twoSided, round(dRaw, roundTo)).as("d"),
      when(twoSided, round(critRaw, roundTo)).as("crit"),
      when(twoSided, dRaw > critRaw).as("drifted"),
      when(twoSided, least(lit(1000000L),
        round(pRaw * lit(1000000.0)).cast(LongType))).as("p_micro"))
  }

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg 1995)
    * — the multiple-testing correction the per-segment families NEED:
    * [[ksTestBy]]/[[rocAucBy]] emit one test per segment, and at 20+
    * segments "p < 0.05 somewhere" is expected noise; BH bounds the
    * expected FALSE-DISCOVERY fraction among the rejected set at q.
    *
    * PURE INTEGER arithmetic end to end: p-values are integral
    * micro-probabilities (fail-loud range guard), q enters as the
    * rational qNum/qDen, and the step-up condition
    * p₍ᵢ₎ ≤ (i/m)·q restates as p₍ᵢ₎·m·qDen ≤ i·qNum·10⁶ — exact int64
    * in any engine (p ≤ 10⁶, m·qDen ≤ ~10⁹). The cutoff k* = max{i :
    * cond(i)} and every hypothesis with rank ≤ k* rejects (the step-up:
    * ranks BELOW a satisfying rank reject even where their own
    * condition fails). Ties order (p, key) — deterministic.
    *
    * Scale shape: the input is a per-segment test frame — model-sized
    * by construction (one row per segment/hypothesis); the rank window
    * keys on the constant pmod(p, 1) (the registry lint idiom) and the
    * cutoff attaches by 1-row broadcast. NULL p rows drop: an untested
    * hypothesis (single-class segment) is not part of m.
    *
    * Output: (keyCol, p_micro, rank, m, rejected), ordered consumers
    * sort. */
  def bhFdr(
      df: DataFrame,
      keyCol: String,
      pCol: String,
      qNum: Int = 1,
      qDen: Int = 20): DataFrame = {
    require(qNum >= 1 && qNum <= qDen && qDen <= 1000,
      s"q = $qNum/$qDen outside (0, 1] or qDen > 1000")
    df.schema(pCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.bhFdr: p column '$pCol' must be an integral " +
          s"micro-probability (got $dt) — round(p*1e6)")
    }
    val W = org.apache.spark.sql.expressions.Window
    val base = df.where(col(pCol).isNotNull)
      .select(col(keyCol).as("key"),
        microProbGuard(col(pCol), "Quality.bhFdr").as("p_micro"))
    val wOrd = W.partitionBy(pmod(col("p_micro"), lit(1)))
      .orderBy(col("p_micro"), col("key"))
    val wAll = W.partitionBy(pmod(col("p_micro"), lit(1)))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    base
      .withColumn("rank", row_number().over(wOrd).cast(LongType))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("kstar", max(when(
        col("p_micro") * col("m") * qDen <= col("rank") * qNum * lit(1000000L),
        col("rank")).otherwise(0L)).over(wAll))
      .select(col("key").as(keyCol), col("p_micro"), col("rank"), col("m"),
        (col("rank") <= col("kstar")).as("rejected"))
  }

  /** Per-segment Theil–Sen robust trend (Theil 1950 / Sen 1968 — the
    * median of all pairwise slopes): the drift family's MAGNITUDE
    * member. [[kendallTau]] against time (Mann–Kendall) answers "is it
    * trending"; THIS answers "by how much per unit time", with a 29%
    * outlier breakdown point where an OLS slope ([[graft.operators
    * .Trend]]-style least squares) is dragged by a single bad window —
    * the robust per-metric trend a drift dashboard quotes.
    *
    * Exactness: t and y integral (fail-loud); every pairwise slope is
    * ONE double division of the exact integer pair (Δy, Δt) — identical
    * cross-engine — and the median is an EXPLICIT rank pick over the
    * (slope, ta, tb)-ordered pair frame at rank ⌈n/2⌉ (lower median;
    * never an engine median() whose interpolation rules differ — the
    * AMS readout discipline), emitted with its exact (slope_num,
    * slope_den) rational witness. The intercept is the explicit median
    * of residuals y − slope·t computed from the PUBLISHED rounded slope
    * (the [[rocAucCi]] derived-from-published discipline).
    *
    * Contract: ONE row per (segment, t) — duplicate timestamps raise
    * (pre-aggregate first: the caller decides sum vs mean, never this
    * operator silently); segments need ≥ 2 points (absent otherwise);
    * points per segment are bounded by `maxPoints` (fail-loud — the
    * pair frame is points², the [[kendallTau]] cells² scale contract
    * made explicit).
    *
    * Scale shape: the input is a per-(segment, t) AGGREGATE frame —
    * model-sized by construction (the caller's one corpus aggregation
    * produces it); the pair self-join and both median windows partition
    * BY SEGMENT — real parallelism, bounded at points² per segment. */
  def theilSenBy(
      df: DataFrame,
      segmentCol: String,
      tCol: String,
      yCol: String,
      maxPoints: Int = 4096,
      roundTo: Int = 6): DataFrame = {
    require(maxPoints >= 2, s"maxPoints $maxPoints must be >= 2")
    Seq(tCol, yCol).foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ByteType
           | _: org.apache.spark.sql.types.ShortType
           | _: org.apache.spark.sql.types.IntegerType
           | _: org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"Quality.theilSenBy: column '$c' must be integral (got $dt) — " +
            "pre-quantize with an exact integer expression")
      }
    }
    import org.apache.spark.sql.types.DoubleType
    val W = org.apache.spark.sql.expressions.Window
    val wSeg = W.partitionBy("segment")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val wDup = W.partitionBy(col("segment"), col("t"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val pts = df
      .where(col(segmentCol).isNotNull && col(tCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(segmentCol).as("segment"), col(tCol).cast(LongType).as("t"),
        col(yCol).cast(LongType).as("y"))
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("n_points", count(lit(1)).over(wSeg))
      .select(col("segment"), col("t"), col("n_points"),
        when(col("__dup") === 1L && col("n_points") <= maxPoints, col("y"))
          .otherwise(raise_error(concat(
            lit("Quality.theilSenBy: segment "), col("segment").cast("string"),
            lit(s" violates the points contract (duplicate t or > $maxPoints " +
              "points) — pre-aggregate to one row per (segment, t) and/or " +
              "quantize t coarser")))).as("y"))
    val a = pts.select(col("segment"), col("t").as("ta"), col("y").as("ya"),
      col("n_points"))
    val b = pts.select(col("segment"), col("t").as("tb"), col("y").as("yb"))
    val wRank = W.partitionBy("segment").orderBy(col("sl"), col("ta"), col("tb"))
    val med = a.join(b, Seq("segment")).where(col("ta") < col("tb"))
      .select(col("segment"), col("n_points"), col("ta"), col("tb"),
        (col("yb") - col("ya")).as("slope_num"),
        (col("tb") - col("ta")).as("slope_den"))
      .withColumn("sl",
        col("slope_num").cast(DoubleType) / col("slope_den").cast(DoubleType))
      .withColumn("r", row_number().over(wRank).cast(LongType))
      .withColumn("n_pairs", count(lit(1)).over(wSeg))
      .where(col("r") === expr("(n_pairs + 1) DIV 2"))
      .select(col("segment"), col("n_points"), col("n_pairs"),
        col("slope_num"), col("slope_den"), round(col("sl"), roundTo).as("slope"))
    // intercept = explicit median of y − slope·t from the PUBLISHED slope
    val wR2 = W.partitionBy("segment").orderBy(col("resid"), col("t"))
    val wSeg2 = W.partitionBy("segment")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    pts.select(col("segment"), col("t"), col("y"))
      .join(med, Seq("segment"))
      .withColumn("resid",
        col("y").cast(DoubleType) - col("slope") * col("t").cast(DoubleType))
      .withColumn("rr", row_number().over(wR2).cast(LongType))
      .withColumn("nn", count(lit(1)).over(wSeg2))
      .where(col("rr") === expr("(nn + 1) DIV 2"))
      .select(col("segment").as(segmentCol), col("n_points"), col("n_pairs"),
        col("slope_num"), col("slope_den"), col("slope"),
        round(col("resid"), roundTo).as("intercept"))
  }

  /** Per-segment Mann–Kendall trend test (Mann 1945; Kendall 1975; the
    * tie-corrected variance of Kendall 1975 §4) — the SIGNIFICANCE
    * companion of [[theilSenBy]]: Theil–Sen answers "by how much per
    * unit time", THIS answers "is the trend real or noise", with the
    * same distribution-free pair census (no linearity or normality
    * assumption — the standard pairing in every monitoring stack:
    * Mann–Kendall decides, Theil–Sen quantifies).
    *
    * Math: S = Σ_{i<j by t} sgn(y_j − y_i) — an EXACT integer off the
    * per-segment pair frame. Under H₀ (no trend), Var(S) =
    * [n(n−1)(2n+5) − Σ_g m_g(m_g−1)(2m_g+5)] / 18 with m_g the tie-group
    * sizes over y (Kendall's correction — without it, tied series
    * over-reject). The 18·Var(S) numerator (`var18`) is emitted as the
    * exact integer witness; z applies the standard continuity
    * correction: z = (S−1)/√Var(S) for S>0, (S+1)/√Var(S) for S<0, 0 at
    * S=0 — ONE fixed-order double chain with one IEEE sqrt. `trending`
    * compares the UNROUNDED |z| to the two-sided normal 95% literal
    * 1.959963984540054 (the [[mcnemar]] rule); `direction` reads the
    * exact sign of S.
    *
    * Contract ([[theilSenBy]]'s, verbatim): t and y integral
    * (fail-loud); ONE row per (segment, t) — duplicate timestamps raise
    * (pre-aggregate first); segments need ≥ 2 points (absent
    * otherwise); ≤ `maxPoints` per segment (fail-loud — the pair frame
    * is points²). Guards: z/trending NULL when var18 = 0 (every y tied
    * — no evidence, never a fabricated z); direction always emitted
    * (the sign of S is data, not inference).
    *
    * Scale shape: the input is a per-(segment, t) AGGREGATE frame —
    * model-sized by construction; the pair self-join and the tie census
    * partition BY SEGMENT, bounded at points² per segment (the
    * [[theilSenBy]] shape — segments test independently across the
    * cluster). Output one row per segment:
    * (segment, n_points, s_stat, var18, z, trending, direction). */
  def mannKendallBy(
      df: DataFrame,
      segmentCol: String,
      tCol: String,
      yCol: String,
      maxPoints: Int = 4096,
      roundTo: Int = 6): DataFrame = {
    require(maxPoints >= 2, s"maxPoints $maxPoints must be >= 2")
    Seq(tCol, yCol).foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ByteType
           | _: org.apache.spark.sql.types.ShortType
           | _: org.apache.spark.sql.types.IntegerType
           | _: org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"Quality.mannKendallBy: column '$c' must be integral (got $dt) — " +
            "pre-quantize with an exact integer expression")
      }
    }
    import org.apache.spark.sql.types.DoubleType
    val W = org.apache.spark.sql.expressions.Window
    val wSeg = W.partitionBy("segment")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val wDup = W.partitionBy(col("segment"), col("t"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val pts = df
      .where(col(segmentCol).isNotNull && col(tCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(segmentCol).as("segment"), col(tCol).cast(LongType).as("t"),
        col(yCol).cast(LongType).as("y"))
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("n_points", count(lit(1)).over(wSeg))
      .select(col("segment"), col("t"), col("n_points"),
        when(col("__dup") === 1L && col("n_points") <= maxPoints, col("y"))
          .otherwise(raise_error(concat(
            lit("Quality.mannKendallBy: segment "), col("segment").cast("string"),
            lit(s" violates the points contract (duplicate t or > $maxPoints " +
              "points) — pre-aggregate to one row per (segment, t) and/or " +
              "quantize t coarser")))).as("y"))
    val a = pts.select(col("segment"), col("t").as("ta"), col("y").as("ya"),
      col("n_points"))
    val b = pts.select(col("segment"), col("t").as("tb"), col("y").as("yb"))
    // S over every t-ordered pair exactly once; exact long
    val sStat = a.join(b, Seq("segment")).where(col("ta") < col("tb"))
      .groupBy("segment")
      .agg(max(col("n_points")).as("n_points"),
        coalesce(sum(signum(col("yb") - col("ya")).cast(LongType)), lit(0L))
          .as("s_stat"))
      .where(col("n_points") >= 2L)
    // tie census over y: Σ m(m−1)(2m+5) — exact long (n ≤ maxPoints)
    val ties = pts.groupBy(col("segment"), col("y"))
      .agg(count(lit(1)).as("m"))
      .groupBy("segment")
      .agg(coalesce(sum(col("m") * (col("m") - 1L) * (lit(2L) * col("m") + 5L)),
        lit(0L)).as("tie18"))
    val nL = col("n_points")
    val var18 = nL * (nL - 1L) * (lit(2L) * nL + 5L) - col("tie18")
    val varS = col("var18").cast(DoubleType) / lit(18.0)
    // continuity-corrected z: one fixed-order chain, one IEEE sqrt
    val zRaw = when(col("s_stat") > 0L,
        (col("s_stat") - 1L).cast(DoubleType) / sqrt(varS))
      .when(col("s_stat") < 0L,
        (col("s_stat") + 1L).cast(DoubleType) / sqrt(varS))
      .otherwise(lit(0.0))
    val crit = lit(1.959963984540054)
    sStat.join(ties, Seq("segment"))
      .withColumn("var18", var18)
      .select(
        col("segment").as(segmentCol),
        col("n_points"),
        col("s_stat"),
        col("var18"),
        when(col("var18") > 0L, round(zRaw, roundTo)).as("z"),
        when(col("var18") > 0L, abs(zRaw) > crit).as("trending"),
        when(col("s_stat") > 0L, "up").when(col("s_stat") < 0L, "down")
          .otherwise("flat").as("direction"))
  }

  /** Per-segment winsorized and trimmed means (Winsor's rule as
    * formalized by Dixon 1960; Tukey & McLaughlin 1963 on the trimmed
    * mean) — the ROBUST-AGGREGATION member of the quality tier: a raw
    * per-source mean of any heavy-tailed metric (doc length, latency,
    * spend) is owned by its top outlier; capping (winsorizing) or
    * dropping (trimming) k elements per side is the standard
    * pre-aggregation transform every metrics pipeline applies before
    * comparing segments — and the k-element rule must be EXACT, or two
    * engines cap different rows.
    *
    * Exactness — the all-integer rank discipline: values integral
    * (fail-loud; the quantization bounds the per-segment cells frame);
    * k = n·pctNum DIV pctDen is PURE integer arithmetic; the caps are
    * exact rank picks over the v-ordered cumulative cell counts
    * (lo = value at rank k+1, hi = value at rank n−k — the theilSenBy
    * pick convention); the winsorized sum Σ c·clamp(v, lo, hi) and the
    * trimmed sum (interior ranks only, partial cells split EXACTLY by
    * rank overlap) accumulate as Decimal(38,0); each mean is ONE double
    * division, rounded. Guards: trimmed mean NULL when n − 2k < 1
    * (nothing left); k = 0 degenerates to the raw mean exactly;
    * segments with no rows are absent.
    *
    * Scale shape: ONE corpus pass to per-(segment, v) cells; cumulative
    * windows partition BY SEGMENT over the model-sized cells frame;
    * caps broadcast back by segment equi-join. Output one row per
    * segment: (segment, n, k_winsor, lo_cap, hi_cap, mean_raw,
    * mean_winsor, mean_trimmed). */
  def winsorizedMeanBy(
      df: DataFrame,
      segmentCol: String,
      valueCol: String,
      pctNum: Int = 1,
      pctDen: Int = 20,
      roundTo: Int = 6): DataFrame = {
    require(pctNum >= 1 && pctDen >= 2 && pctNum * 2 < pctDen,
      s"winsorizedMeanBy: fraction $pctNum/$pctDen must be in (0, 1/2) — " +
        "winsorizing half each side leaves nothing")
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.winsorizedMeanBy: value column '$valueCol' must be " +
          s"integral (got $dt) — pre-quantize with an exact integer " +
          "expression")
    }
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val DEC = DecimalType(38, 0)
    val W = org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(segmentCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(segmentCol).as("segment"),
        col(valueCol).cast(LongType).as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = W.partitionBy("segment").orderBy("v")
      .rowsBetween(W.unboundedPreceding, 0)
    val wSeg = W.partitionBy("segment")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val cum = cells
      .withColumn("cw", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wSeg))
      .withColumn("k", expr(s"n * $pctNum DIV $pctDen"))
    val caps = cum.groupBy("segment")
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        min(when(col("cw") >= col("k") + 1L, col("v"))).as("lo_cap"),
        min(when(col("cw") >= col("n") - col("k"), col("v"))).as("hi_cap"))
    val joined = cum.join(caps.select(col("segment"),
      col("lo_cap"), col("hi_cap")), "segment")
    // trimmed interior overlap of a cell spanning ranks (cw−c, cw]:
    // the ranks inside (k, n−k] — exact integer clipping
    val interior = greatest(lit(0L),
      least(col("cw"), col("n") - col("k")) -
        greatest(col("cw") - col("c"), col("k")))
    val sums = joined.groupBy("segment").agg(
      sum(col("c").cast(DEC) * col("v")).as("s_raw"),
      sum(col("c").cast(DEC) *
        greatest(col("lo_cap"), least(col("hi_cap"), col("v"))))
        .as("s_wins"),
      sum(interior.cast(DEC) * col("v")).as("s_trim"))
    val out = caps.join(sums, "segment")
    val nD = col("n").cast(DoubleType)
    val interiorN = col("n") - lit(2L) * col("k")
    out.select(
      col("segment").as(segmentCol),
      col("n"), col("k").as("k_winsor"),
      col("lo_cap"), col("hi_cap"),
      round(col("s_raw").cast(DoubleType) / nD, roundTo).as("mean_raw"),
      round(col("s_wins").cast(DoubleType) / nD, roundTo).as("mean_winsor"),
      when(interiorN >= 1L,
        round(col("s_trim").cast(DoubleType) / interiorN.cast(DoubleType),
          roundTo)).as("mean_trimmed"))
  }

  /** Isotonic regression calibration (pool-adjacent-violators solution,
    * Ayer et al. 1955 / Zadrozny & Elkan 2002) — the ACTION following
    * [[calibrationCurve]]'s diagnosis: fit the monotone step function
    * mapping raw score → calibrated P(y=1), the standard production
    * calibrator when the score RANKS well (high [[rocAuc]]) but cannot
    * be read as a probability (bad ECE / [[brierScore]] skill).
    *
    * Computed WITHOUT the sequential PAV loop, via the minimax identity
    * (Robertson–Wright–Dykstra): fitted(s) = max_{i≤s} min_{j≥s}
    * rate(i,j) with rate = pooled positives/count over the score
    * interval [i, j] — two ordered extrema passes over the cells²
    * interval frame, every step distributed and ENGINE-PORTABLE: rates
    * are single divisions of exact cumulative integers (both engines
    * produce the identical double, and min/max comparisons are exact —
    * no summation-order dependence anywhere).
    *
    * `scoreCol` integral pre-quantized (the [[rocAuc]] rule — the
    * quantization also bounds the cells² interval frame, the scale
    * contract). Output one row per distinct score:
    * (score, n_s, pos_s, rate_raw, fitted) — `fitted` non-decreasing by
    * construction (spec-asserted, plus equality with a sequential PAV
    * reference).
    *
    * Scale shape: ONE corpus aggregation to the cells frame; the
    * interval frame and both extrema windows are cells²-sized — bounded
    * by the caller's quantization at ANY corpus size. */
  def isotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.isotonicCalibration: score column '$scoreCol' must be " +
          s"integral (got $dt) — pre-quantize with an exact integer expression")
    }
    val W = org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n_s"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos_s"))
    val wCum = W.partitionBy(pmod(col("s"), lit(1))).orderBy("s")
      .rowsBetween(W.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cp", sum(col("pos_s")).over(wCum))
      .withColumn("cn", sum(col("n_s")).over(wCum))
    val lo = cum.select(col("s").as("si"),
      (col("cp") - col("pos_s")).as("p_before"),
      (col("cn") - col("n_s")).as("n_before"))
    val hi = cum.select(col("s").as("sj"), col("cp"), col("cn"))
    // interval rate over [si, sj]: ONE division of exact integers —
    // bit-identical in any IEEE engine, so the extrema below compare
    // identically with zero rounding anywhere in the lattice
    val intervals = lo.join(hi, col("si") <= col("sj"))
      .select(col("si"), col("sj"),
        ((col("cp") - col("p_before")).cast("double") /
          (col("cn") - col("n_before"))).as("rate"))
    // g(i, s) = min over j ≥ s of rate(i, j): suffix-min per i
    val wSuf = W.partitionBy("si").orderBy(col("sj").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    val g = intervals.withColumn("g", min(col("rate")).over(wSuf))
    // fitted(s) = max over i ≤ s of g(i, s): every (i, s) row in the
    // s-partition has i ≤ s by the interval construction
    val fit = g.groupBy(col("sj").as("s")).agg(max(col("g")).as("f"))
    cells.join(fit, "s")
      .select(col("s").as(scoreCol), col("n_s"), col("pos_s"),
        round(col("pos_s").cast("double") / col("n_s"), roundTo).as("rate_raw"),
        round(col("f"), roundTo).as("fitted"))
  }

  /** Kendall rank correlation τ-b (Kendall 1938; the τ-b tie correction)
    * between two integral score columns — [[spearmanRho]]'s companion on
    * the PAIR-level agreement scale: ρ measures rank-value correlation,
    * τ measures P(concordant) − P(discordant) directly, the
    * interpretation auditors quote ("73% of pairs order the same way").
    *
    * Both columns integral pre-quantized (the [[rocAuc]] rule) — here
    * the quantization ALSO bounds the joint-cells frame whose self-join
    * computes the pair census, so it is the scale contract, not just a
    * portability nicety. Exactness: concordant/discordant/tie counts
    * are exact integer sums of cell-count products over the model-sized
    * cells self-join (each unordered x-differing pair visited once via
    * a.x < b.x); τ-b = (C−D)/(√(n₀−T_x)·√(n₀−T_y)) with two
    * IEEE-correctly-rounded sqrts and one division (the wilson
    * discipline), rounded. NULL when either side is constant.
    *
    * Scale shape: ONE corpus aggregation to the joint cells frame;
    * the self-join and the tie census are cells²-sized — bounded by the
    * caller's quantization at ANY corpus size (the documented
    * distinct-cells contract). Output one row:
    * (n, concordant, discordant, tau). */
  def kendallTau(
      df: DataFrame,
      xCol: String,
      yCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Seq(xCol, yCol).foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ByteType
           | _: org.apache.spark.sql.types.ShortType
           | _: org.apache.spark.sql.types.IntegerType
           | _: org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"Quality.kendallTau: score column '$c' must be integral " +
            s"(got $dt) — pre-quantize with an exact integer expression")
      }
    }
    val DEC = DecimalType(38, 0)
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    // every unordered x-differing pair exactly once
    val cd = a.join(b, col("xa") < col("xb"))
      .agg(
        coalesce(sum(when(col("ya") < col("yb"),
          col("ca").cast(DEC) * col("cb"))), lit(0).cast(DEC)).as("conc"),
        coalesce(sum(when(col("ya") > col("yb"),
          col("ca").cast(DEC) * col("cb"))), lit(0).cast(DEC)).as("disc"))
    // marginal tie census: n0 − T_x = Σ pairs differing in x, etc.
    def tiePairs(kc: String) = cells.groupBy(col(kc)).agg(sum(col("c")).as("m"))
      .agg(
        coalesce(sum(col("m").cast(DEC) * (col("m") - 1) / 2), lit(0).cast(DEC))
          .as(s"t_$kc"),
        coalesce(sum(col("m")), lit(0L)).as(s"n_$kc"))
    val out = cd
      .crossJoin(broadcast(tiePairs("x")))
      .crossJoin(broadcast(tiePairs("y")))
      .select(col("n_x").as("n"), col("conc"), col("disc"),
        (col("n_x").cast(DEC) * (col("n_x") - 1) / 2).as("n0"),
        col("t_x"), col("t_y"))
    out.select(
      col("n"),
      col("conc").cast("long").as("concordant"),
      col("disc").cast("long").as("discordant"),
      when((col("n0") - col("t_x")) > 0 && (col("n0") - col("t_y")) > 0,
        round((col("conc") - col("disc")).cast("double") /
          (sqrt((col("n0") - col("t_x")).cast("double")) *
           sqrt((col("n0") - col("t_y")).cast("double"))), roundTo)).as("tau"))
  }

  /** Per-segment ROC-AUC — [[rocAuc]] GROUPED by a segment column (the
    * fairness/coverage audit: "does the quality gate rank source X as
    * well as source Y"; a global AUC hides a segment where the score is
    * inverted). Same cells-frame arithmetic per group, same exact-2U
    * accumulation (emitted as int64 — documented bound 2·nPos·nNeg < 2⁶³
    * per segment), AUC NULL for single-class segments. Output one row
    * per segment: (grpCol, n, n_pos, n_neg, u2, auc).
    *
    * Scale shape: ONE corpus aggregation to the (segment × distinct
    * score) cells frame; the cumulative window partitions BY SEGMENT
    * (real parallelism, unlike the global operator's constant-key
    * frame), so segments rank independently across the cluster. */
  def rocAucBy(
      df: DataFrame,
      grpCol: String,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.rocAucBy: score column '$scoreCol' must be integral " +
          s"(got $dt) — pre-quantize with an exact integer expression")
    }
    val DEC = DecimalType(38, 0)
    val cells = df
      .where(col(grpCol).isNotNull &&
        col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(grpCol).as("g"), col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos_s"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    cells
      .withColumn("n_lt", coalesce(sum(col("n_neg_s")).over(w), lit(0L)))
      .groupBy("g")
      .agg(
        coalesce(sum(col("n_pos_s").cast(DEC) *
          (lit(2L).cast(DEC) * col("n_lt").cast(DEC) +
            col("n_neg_s").cast(DEC))), lit(0).cast(DEC)).as("u2d"),
        coalesce(sum(col("n_pos_s")), lit(0L)).as("n_pos"),
        coalesce(sum(col("n_neg_s")), lit(0L)).as("n_neg"))
      .select(
        col("g").as(grpCol),
        (col("n_pos") + col("n_neg")).as("n"),
        col("n_pos"), col("n_neg"),
        col("u2d").cast("long").as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2d").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), roundTo)).as("auc"))
  }

  /** Spearman rank correlation between two integral score columns —
    * [[rocAuc]] audits one score against a LABEL, this audits two
    * scores against EACH OTHER on rank agreement (Spearman 1904):
    * the monotone-association read behind "is this cheap score a
    * drop-in for that expensive one", "does quality confound with
    * length", and score-drift checks where Pearson's linearity
    * assumption is wrong. ρ = Pearson over midranks (average rank on
    * ties — the standard tie treatment).
    *
    * Both columns must be INTEGRAL pre-quantized scores (the [[rocAuc]]
    * portability rule, fail-loud). Exactness: midranks are half-integers,
    * so every rank is carried DOUBLED (2·midrank = 2·cum_before + cnt + 1
    * — an exact integer off the per-distinct-value cells frame); all
    * sufficient statistics (Σ2x·2y, Σ(2x)², marginal sums) accumulate as
    * exact decimals; ρ = (n·Σxy − ΣxΣy) / (√(n·Σx² − (Σx)²)·√(n·Σy² −
    * (Σy)²)) combines them with two IEEE-correctly-rounded sqrts and one
    * division (the wilson discipline), rounded. ρ NULL when either side
    * is constant (zero rank variance — undefined, never NaN).
    *
    * Scale shape: one model-sized cells frame per column (distinct-value-
    * bounded by the quantization contract, cumulated under a literal-key
    * window), broadcast-joined back onto ONE corpus pass that feeds a
    * single map-side-combined aggregation. Output one row:
    * (n, rho). */
  def spearmanRho(
      df: DataFrame,
      xCol: String,
      yCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Seq(xCol, yCol).foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ByteType
           | _: org.apache.spark.sql.types.ShortType
           | _: org.apache.spark.sql.types.IntegerType
           | _: org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"Quality.spearmanRho: score column '$c' must be integral " +
            s"(got $dt) — pre-quantize with an exact integer expression")
      }
    }
    val DEC = DecimalType(38, 0)
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("xv"), col(yCol).cast("long").as("yv"))
    def rank2(valCol: String, out: String) = {
      val cells = rows.groupBy(col(valCol).as("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("v"), lit(1))).orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      cells
        .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
        // doubled midrank: positions cum+1 .. cum+cnt average to
        // cum + (cnt+1)/2, so 2·midrank = 2·cum + cnt + 1 — exact
        .select(col("v"), (lit(2L) * col("cum") + col("cnt") + 1L).as(out))
    }
    val withRanks = rows
      .join(broadcast(rank2("xv", "rx2")), col("xv") === col("v"))
      .drop("v")
      .join(broadcast(rank2("yv", "ry2")), col("yv") === col("v"))
      .drop("v")
    val stats = withRanks.agg(
      count(lit(1)).as("n"),
      sum(col("rx2").cast(DEC)).as("sx"),
      sum(col("ry2").cast(DEC)).as("sy"),
      sum(col("rx2").cast(DEC) * col("rx2").cast(DEC)).as("sxx"),
      sum(col("ry2").cast(DEC) * col("ry2").cast(DEC)).as("syy"),
      sum(col("rx2").cast(DEC) * col("ry2").cast(DEC)).as("sxy"))
    // n·Σxy − ΣxΣy etc. stay in exact decimal; the 2× rank scaling
    // cancels between numerator and denominator
    stats.select(
      col("n"),
      when(col("n") > 0 &&
          (col("n").cast(DEC) * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n").cast(DEC) * col("syy") - col("sy") * col("sy")) > 0,
        round(
          (col("n").cast(DEC) * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (sqrt((col("n").cast(DEC) * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n").cast(DEC) * col("syy") - col("sy") * col("sy"))
            .cast("double"))),
          roundTo)).as("rho"))
  }

  /** Corpus-side range guard for integral micro-probability scores: the
    * driver-side type require catches a mis-typed column, this catches a
    * mis-RANGED one (negative or > 10⁶ would silently yield brier > 1,
    * out-of-range bins, conf/gap outside [−1,1]) — fail loud on the row,
    * the [[graft.operators.Sketches]] hdr negative-value discipline. */
  private def microProbGuard(score: Column, who: String): Column = {
    val sc = score.cast("long")
    when(sc >= 0L && sc <= 1000000L, sc).otherwise(raise_error(concat(
      lit(s"$who: score "), sc.cast("string"),
      lit(" outside the micro-probability range [0, 1e6] — quantize as " +
        "round(p*1e6) and pre-clamp"))).cast("long"))
  }

  /** Brier score + skill — the PROPER scoring rule completing the
    * calibration family ([[calibrationCurve]] audits bin-wise value
    * agreement, the Brier score prices every individual prediction:
    * mean (p − y)², minimized only by the true probabilities, so a
    * gate score cannot game it the way it can game a threshold metric).
    * Also emitted: `uncertainty` = ȳ(1−ȳ) (the Brier score of always
    * predicting the base rate — the no-skill floor) and `skill` =
    * 1 − brier/uncertainty (the Brier skill score vs that floor; > 0
    * means the score carries real probability information).
    *
    * `scoreCol` is an integral micro-probability in [0, 10⁶] (the
    * [[calibrationCurve]] convention, fail-loud). Exactness: with
    * d = score − y·10⁶ the numerator Σd² is an exact decimal integer;
    * brier = Σd²/(n·10¹²), uncertainty = n_pos·n_neg/n², and skill =
    * 1 − Σd²·n/(10¹²·n_pos·n_neg) are each ONE double division of exact
    * integer operands, rounded. skill NULL when uncertainty = 0 (a
    * single-class corpus has no floor to beat — undefined, never ±Inf).
    *
    * Scale shape: ONE corpus aggregation to four exact scalars —
    * map-side combined, nothing model-sized even to broadcast. */
  def brierScore(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.brierScore: score column '$scoreCol' must be an " +
          s"integral micro-probability (got $dt) — quantize as round(p*1e6)")
    }
    val DEC = DecimalType(38, 0)
    val M = 1000000L
    val stats = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(microProbGuard(col(scoreCol), "Quality.brierScore").as("sc"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum((col("sc") - col("y") * M).cast(DEC) *
          (col("sc") - col("y") * M).cast(DEC)).as("d2"))
    stats.select(
      col("n"), col("n_pos"),
      when(col("n") > 0,
        round(col("d2").cast("double") /
          (col("n").cast("double") * 1e12), roundTo)).as("brier"),
      when(col("n") > 0,
        round(col("n_pos").cast("double") *
          (col("n") - col("n_pos")).cast("double") /
          (col("n").cast("double") * col("n").cast("double")), roundTo))
        .as("uncertainty"),
      when(col("n_pos") > 0 && col("n_pos") < col("n"),
        round(lit(1.0) -
          (col("d2") * col("n").cast(DEC)).cast("double") /
          (lit(1e12) * col("n_pos").cast("double") *
            (col("n") - col("n_pos")).cast("double")), roundTo)).as("skill"))
  }

  /** Binned calibration curve + expected calibration error — [[rocAuc]]
    * audits a score's RANKING, this audits its VALUES: a well-calibrated
    * score's bin-mean prediction matches the bin's empirical positive
    * rate (Naeini et al. 2015's ECE is the weighted mean |gap|), the
    * audit that decides whether a quality score can be read as a
    * probability (e.g. as a [[dsirWeights]]-style sampling weight) or
    * only as a rank.
    *
    * `scoreCol` is an integral MICRO-probability in [0, 10⁶] (the q223
    * micro-quantization convention; the integral-type require as
    * [[rocAuc]]). Bin b = min(score·bins div 10⁶, bins−1) — pure integer
    * arithmetic, portable. Per occupied bin: n, sum_score (exact),
    * conf = sum_score/(n·10⁶), acc = n_pos/n, gap = acc−conf (each ONE
    * double division/combination of exact integers, rounded). ECE rides
    * the same exactness: n_b·|acc_b−conf_b| = |n_pos_b·10⁶ −
    * sum_score_b|/10⁶, so ece = Σ_b |n_pos_b·10⁶ − sum_score_b| /
    * (N·10⁶) — the numerator an exact integer sum, one final division.
    * Empty bins emit nothing (the [[confusionMatrix]] dense-grid rule).
    *
    * Scale shape: ONE corpus aggregation to the ≤bins-row frame
    * (map-side combined); the ECE fold and broadcast re-attach are
    * model-sized. */
  def calibrationCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(bins >= 2 && bins <= 1000, s"bins $bins outside [2,1000]")
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Quality.calibrationCurve: score column '$scoreCol' must be an " +
          s"integral micro-probability (got $dt) — quantize as round(p*1e6)")
    }
    val DEC = DecimalType(38, 0)
    val M = 1000000L
    val binned = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(microProbGuard(col(scoreCol), "Quality.calibrationCurve").as("sc"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .select(
        least(floor(col("sc") * bins / M), lit(bins - 1L))
          .cast("long").as("bin"),
        col("sc"), col("y"))
    val perBin = binned.groupBy("bin").agg(
      count(lit(1)).as("n"),
      sum(col("sc").cast(DEC)).as("sum_score"),
      sum(col("y")).as("n_pos"))
    val ece = perBin.agg(
      coalesce(sum(abs(col("n_pos").cast(DEC) * lit(M).cast(DEC) -
        col("sum_score"))), lit(0).cast(DEC)).as("gap_num"),
      coalesce(sum(col("n")), lit(0L)).as("n_tot"))
      .select(when(col("n_tot") > 0,
        round(col("gap_num").cast("double") /
          (col("n_tot").cast("double") * M.toDouble), roundTo)).as("ece"))
    perBin
      .crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_score").cast("double") /
          (col("n").cast("double") * M.toDouble), roundTo).as("conf"),
        round(col("n_pos").cast("double") / col("n").cast("double"), roundTo)
          .as("acc"),
        round((col("n_pos").cast("double") * M.toDouble -
          col("sum_score").cast("double")) /
          (col("n").cast("double") * M.toDouble), roundTo).as("gap"),
        col("ece"))
      .orderBy("bin")
  }

  /** The published C4 line-level cleanup (Raffel et al. 2020 §2.2 — the
    * other canonical web-corpus gate, [[gopherRules]]' line-granular
    * companion): per document,
    *
    *  - page rules on the RAW text, in published order: containing
    *    `lorem ipsum` (case-insensitive) or `{` drops the page outright
    *    (`drop_reason` = `lorem_ipsum` / `brace`);
    *  - line rules: keep a line iff it ends in a terminal punctuation
    *    mark (`.` `!` `?` `"` after right-trim), carries at least
    *    `minLineWords` whitespace words, and does not mention
    *    `javascript` (case-insensitive);
    *  - a surviving page with fewer than `minSentences` sentences in its
    *    KEPT text (sentence ≈ terminal `.`/`!`/`?` occurrence — the
    *    declared approximation; C4's own splitter is heuristic too) is
    *    dropped (`too_few_sentences`).
    *
    * Output per doc: (idCol, n_lines, n_kept_lines, n_kept_words,
    * n_sentences, drop_reason, kept_text) — `drop_reason` NULL for
    * survivors, and `kept_text` always carries the filtered page (join
    * on `\n`) so an audit can read what the gate would keep even for
    * dropped pages. An all-lines-dropped survivor is `too_few_sentences`
    * by construction, never a silent empty page.
    *
    * Scale shape: the [[gopherRules]] discipline exactly — one narrow
    * per-row projection chain, zero shuffles/UDFs/explodes, lines staged
    * once, the compact-table repartition spread. */
  def c4Filter(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    require(minLineWords >= 1, s"c4Filter: minLineWords $minLineWords < 1")
    require(minSentences >= 0, s"c4Filter: minSentences $minSentences < 0")
    val staged = df
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), col("t"),
        filter(split(col("t"), "\n"), l => l =!= "").as("ls"))
    def keptLine(l: Column): Column = {
      val lt = rtrim(l)
      (lt.endsWith(".") || lt.endsWith("!") || lt.endsWith("?") ||
        lt.endsWith("\"")) &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords &&
        !lower(l).contains("javascript")
    }
    val kept = staged.select(col("id"), col("t"),
      size(col("ls")).cast(LongType).as("n_lines"),
      filter(col("ls"), keptLine _).as("kls"))
    val shaped = kept.select(col("id"), col("t"), col("n_lines"),
      size(col("kls")).cast(LongType).as("n_kept_lines"),
      aggregate(col("kls"), lit(0L),
        (a, l) => a + size(filter(split(l, "\\s+"), w => w =!= "")))
        .as("n_kept_words"),
      array_join(col("kls"), "\n").as("kept_text"))
    val sentenced = shaped.select(col("id"), col("t"), col("n_lines"),
      col("n_kept_lines"), col("n_kept_words"), col("kept_text"),
      (length(col("kept_text")) -
        length(replace(replace(replace(col("kept_text"),
          lit("."), lit("")), lit("!"), lit("")), lit("?"), lit(""))))
        .cast(LongType).as("n_sentences"))
    sentenced.select(
      col("id").as(idCol),
      col("n_lines"), col("n_kept_lines"), col("n_kept_words"),
      col("n_sentences"),
      when(lower(col("t")).contains("lorem ipsum"), lit("lorem_ipsum"))
        .when(col("t").contains("{"), lit("brace"))
        .when(col("n_sentences") < minSentences, lit("too_few_sentences"))
        .otherwise(lit(null).cast("string")).as("drop_reason"),
      col("kept_text"))
  }

  /** Trending terms — term-velocity z-scores against each term's own
    * trailing baseline (the monitoring classic behind "what changed in
    * today's crawl": a term whose current-day count sits far above its
    * prior-day mean is a topic burst, a spam influx, or a scraper
    * picking up a new site — [[distributionDrift]] says THAT the mix
    * moved, this names the terms that moved it).
    *
    * Baseline semantics: the prior mean/sd are over ALL prior calendar
    * days (absent days are genuine ZERO counts — a term seen once
    * before at 100 is a burst, not a 100-mean regular), computed from
    * exact integer sufficient statistics (Σc, Σc² over appearing days;
    * implicit zeros contribute nothing) against the 1-row day count.
    * Only terms present on the CURRENT day score (risers), and only
    * with ≥ 2 prior days and positive variance (a first-ever term has
    * no baseline — surfacing those is [[graft.operators.Dedup]]'s
    * novelty family). z rounds before the final rank; ties break on
    * the term string.
    *
    * Scale shape: one (day, term) aggregation with map-side combining
    * (the only corpus-scale shuffle), vocabulary-sized arithmetic after,
    * a 1-row calendar broadcast, and a TakeOrdered top-k — never a
    * global sort. */
  def trendingTerms(
      df: DataFrame,
      dayCol: Column,
      textCol: String = "text",
      topK: Int = 15,
      roundTo: Int = 4): DataFrame = {
    require(topK >= 1, s"trendingTerms: topK $topK must be >= 1")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toks = df.select(dayCol.as("day"),
        split(lower(col(textCol)), "\\s+").as("toks"))
      .where(col("day").isNotNull)
      .repartition(par)
      .select(col("day"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull && col("term") =!= "")
    val counts = toks.groupBy("day", "term").agg(count(lit(1)).as("c"))
    val cal = counts.agg(countDistinct(col("day")).as("__nd"),
      max(col("day")).as("__d1"))
    val withCal = counts.crossJoin(broadcast(cal))
    val cur = withCal.where(col("day") === col("__d1"))
      .select(col("term"), col("c").as("c_today"))
    val prior = withCal.where(col("day") < col("__d1"))
      .groupBy("term")
      .agg(sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
        first(col("__nd")).as("__nd"))
    val d = (col("__nd") - 1).cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val mean = s1 / d
    val varP = (s2 - s1 * s1 / d) / (d - lit(1.0))
    val scored = cur.join(prior, "term")
      .where(col("__nd") >= 3 && varP > 0.0)
      .select(col("term"), col("c_today"),
        round(mean, roundTo).as("mean_prior"),
        round(sqrt(varP), roundTo).as("sd_prior"),
        round((col("c_today") - mean) / sqrt(varP), roundTo).as("z"))
    scored.orderBy(col("z").desc, col("term")).limit(topK)
  }

  /** χ²-based term–slice association (the feature-selection statistic of
    * Manning & Schütze ch. 5 / Yang & Pedersen 1997): for each (slice,
    * term) the 2×2 document-presence contingency (a = slice docs with
    * the term, b = slice docs without, c = other docs with, d = other
    * docs without) scores χ² = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)).
    * Completes the term-signal family: TF-IDF (q182) ranks WITHIN a
    * document, PMI (q118) pairs terms, KL drift (q91) scores the whole
    * slice — χ² names the terms that make a slice read like itself,
    * with a statistical weight a raw rate ratio lacks.
    *
    * Exactness: a/b/c/d are exact longs from one distinct-presence
    * aggregation; ad and bc stay inside int64 up to N ≈ 3·10⁹ docs and
    * the squared difference moves to double AFTER the exact long
    * subtraction (the combination order the SQL replay mirrors); χ²
    * rounds BEFORE the rank.
    *
    * Guards: terms present in every document carry no signal for any
    * slice ((b+d) = 0) and are dropped, as are terms below `minDf`
    * document frequency (rare-term χ² is unstable — the standard cut).
    *
    * Scale shape: one corpus pass → distinct (doc, slice, term) →
    * (slice, term) counts (map-side combined); term totals reduce from
    * that frame, slice totals and N ride broadcast attaches; the final
    * per-slice top-k is the heap operator, never a global sort. */
  def chiSquaredTerms(
      df: DataFrame,
      sliceCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      minDf: Long = 5L,
      topK: Int = 5,
      roundTo: Int = 4): DataFrame = {
    require(topK >= 1, s"chiSquaredTerms: topK $topK must be >= 1")
    val pres = df
      .select(col(idCol).as("id"), col(sliceCol).as("slice"),
        explode_outer(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(col("term").isNotNull && col("term") =!= "" &&
        col("slice").isNotNull)
      .distinct()
    val st = pres.groupBy("slice", "term").agg(count(lit(1)).as("a"))
    val tt = st.groupBy("term").agg(sum(col("a")).as("t_total"))
    val sn = pres.select("id", "slice").distinct()
      .groupBy("slice").agg(count(lit(1)).as("n_s"))
    val nn = sn.agg(sum(col("n_s")).as("n_total"))
    val j = st.join(tt, "term").join(sn, "slice")
      .crossJoin(broadcast(nn))
      .where(col("t_total") >= minDf && col("t_total") < col("n_total"))
    val a = col("a")
    val b = col("n_s") - col("a")
    val c = col("t_total") - col("a")
    val d = col("n_total") - col("n_s") - c
    val diff = (a * d - b * c).cast("double")
    val chi2 = col("n_total").cast("double") * diff * diff /
      (((a + b) * (c + d)).cast("double") * ((a + c) * (b + d)).cast("double"))
    val scored = j.select(col("slice"), col("term"), col("a").as("df_in"),
      round(chi2, roundTo).as("chi2"),
      when(a * d - b * c > 0, lit("over")).otherwise(lit("under"))
        .as("direction"))
    graft.plans.TopK.perKey(scored,
      Seq(col("slice")), Seq(col("chi2").desc, col("term")), topK)
  }
}
