package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for the LLM-data-pipeline surface (SURVEY.md
  * §2.10 L3): tokenization, shingling, stopword statistics, a language-ID
  * heuristic, a quality score, and a rolling-hash document fingerprint.
  *
  * Everything is a Catalyst expression over built-ins (split / filter /
  * transform / aggregate) so it runs distributed with no UDF; every
  * function here is also expressible verbatim in the DuckDB oracle
  * dialect, which is how the q31–q34 queries gate it.
  */
object TextOps {

  /** Whitespace tokenization (regex `\s+`, consistent with the oracle's
    * string_split_regex). */
  def tokenize(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokenize(text)).cast(LongType)

  /** Count of NON-EMPTY whitespace tokens: `split` emits "" for text
    * with leading whitespace, which [[tokenCount]] counts but no
    * exploded-token consumer ever sees. BM25's document length must
    * count exactly the units its postings tf counts (Retrieval's index
    * invariant: Σ tf per doc = dl), so the retrieval family uses this
    * form. Oracle dialect: len(list_filter(string_split_regex(text,
    * '\s+'), t -> t <> '')). */
  def nonEmptyTokenCount(text: Column): Column =
    size(filter(tokenize(text), t => t =!= lit(""))).cast(LongType)

  /** BPE-style pre-tokenization (SURVEY.md §2.10 L3): letter runs, digit
    * runs, and single punctuation marks — the GPT-2-shaped split rule
    * reduced to a regex that means the same thing in Java regex (Spark)
    * and RE2 (DuckDB's regexp_extract_all). Counts the units a subword
    * tokenizer would start from. */
  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast(LongType)

  /** Distinct word n-gram shingles; empty array when the document has
    * fewer than n tokens.
    *
    * PERF: `text` should be a plain attribute and, in hot paths, tokenize
    * first into its own projection and use [[shinglesFromTokens]] —
    * Catalyst does not CSE non-attribute expressions into lambda bodies,
    * so passing `split(...)` here re-runs the split once per shingle. */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokenize(text), n)

  /** Shingles from an already-materialized token-array column (cheap bound
    * reference inside the lambda — evaluate tokenize in a prior projection). */
  def shinglesFromTokens(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      array_distinct(
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", slice(tk, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Tiny per-language stopword lists for the language-ID heuristic.
    * Deliberately minimal: the heuristic's *shape* (n-gram/stopword hit
    * counting with a deterministic argmax) is the deliverable; real
    * deployments swap in fuller lists. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "mit", "von", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "des", "du", "est", "dans"))

  /** Number of tokens (with multiplicity) that appear in `words` —
    * mirrors the oracle's list_filter + list_contains 1:1. Delegates to
    * [[hitCountToks]] so the matching rule exists exactly once. */
  def hitCount(text: Column, words: Seq[String]): Column =
    hitCountToks(tokenize(text), words)

  /** Deterministic-argmax language guess from stopword hits; 'und' when no
    * list scores a hit. Tie-break order: en > es > de > fr. Delegates to
    * [[languageIdToks]] — one argmax/tie-break implementation. */
  def languageId(text: Column): Column = languageIdToks(tokenize(text))

  /** [[hitCount]] over a pre-staged token ARRAY — callers computing
    * several per-language counts stage the split ONCE (the lambda-CSE
    * discipline: each `filter(tokenize(text), …)` re-splits the text). */
  def hitCountToks(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t))).cast(LongType)

  /** [[languageId]] over a pre-staged token array (same argmax +
    * tie-break contract). */
  def languageIdToks(toks: Column): Column = {
    val hits = Seq("en", "es", "de", "fr").map(l => l -> hitCountToks(toks, stopwords(l)))
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, h), other) =>
      when(h > 0 && h === best, lit(lang)).otherwise(other)
    }
  }

  /** Quality score in [0,1]: length signal + stopword-ratio signal + word-
    * length signal (SURVEY.md §2.10; the standard cheap pre-filter shape
    * for pretraining corpora).
    *
    * The final round goes THROUGH DECIMAL(28,14) (the H.dec rule), not
    * ROUND(double): the components' denominators are small (nt, 50, 8),
    * so the raw score lands EXACTLY on 4-decimal half-way boundaries
    * routinely (e.g. 0.43125 with nt=32) — where Spark's
    * exact-expansion HALF_UP and DuckDB's scaled-multiply rounding
    * disagree by one ulp. Recovering the value at scale 14 first (no
    * boundary there — the double's expansion deviates from the exact
    * value only around digit 17) makes both engines round the SAME
    * decimal, with the same half-away-from-zero rule. Found as 3/500
    * flips at sf0.001; the sf0.01 gate had passed by luck. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = hitCount(text, stopwords("en")).cast("double") / nTok
    val avgTokLen = (length(text) - (nTok - 1)).cast("double") / nTok
    round(
      (least(nTok.cast("double") / 50.0, lit(1.0)) * 0.5 +
        (lit(1.0) - abs(stopRatio - 0.4)) * 0.3 +
        least(avgTokLen / 8.0, lit(1.0)) * 0.2)
        .cast(org.apache.spark.sql.types.DecimalType(28, 14)),
      4).cast("double")
  }

  /** Order-sensitive rolling polynomial fingerprint of the token stream:
    * h = (h*131 + ascii(first char)*31 + len(token)) mod 1e9+7. Character-
    * code arithmetic only, so the oracle reproduces it exactly with
    * list_reduce. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokenize(text), t => (ascii(t) * 31 + length(t)).cast(LongType)),
      lit(0L),
      (h, v) => pmod(h * 131 + v, lit(1000000007L)))

  /** Host component of an http(s)/ftp URL, lowercased — the key for
    * per-domain crawl accounting (domain caps, robots bookkeeping, drift
    * by host). RE2-safe single extract: scheme, optional userinfo
    * (`[^/?#@]*@`), then the host = everything before `:`/`/`/`?`/`#`.
    * Non-URLs and unsupported schemes yield NULL (regexp_extract's
    * no-match empty string is nulled explicitly — absence, not ""). A
    * registrable eTLD+1 needs the Public Suffix LIST (data, not a
    * regex) — callers needing it join a PSL table on this host. */
  def urlHost(url: Column): Column = {
    // (?i): RFC 3986 schemes are case-insensitive — crawl data carries
    // "HTTP://" routinely, and NULLing those would silently undercount
    // their domains in the accounting this keys
    val h = regexp_extract(url,
      "^(?i)(?:https?|ftp)://(?:[^/?#@]*@)?([^/?#:]+)", 1)
    lower(when(h === "", null).otherwise(h))
  }

  /** URL path for robots-exclusion matching ([[urlHost]]'s companion):
    * everything from the first `/` after the authority up to (not
    * including) `?`/`#`; a URL with no path component is "/" (the REP
    * convention — robots rules match against at least the root). NULL
    * for non-URLs (same absence contract as urlHost). Path CASE IS
    * PRESERVED (significant server-side — the canonicalizeUrl rule). */
  def urlPath(url: Column): Column = {
    val valid = regexp_extract(url,
      "^(?i)(?:https?|ftp)://(?:[^/?#@]*@)?([^/?#:]+)", 1)
    val p = regexp_extract(url, "^(?i)(?:https?|ftp)://[^/?#]*(/[^?#]*)", 1)
    when(valid === "", null)
      .otherwise(when(p === "", "/").otherwise(p))
  }

  /** Sentence segmentation in the RE2 subset (no lookbehind): maximal
    * runs of non-terminators with their trailing `.!?` run attached —
    * `regexp_extract_all(text, '[^.!?]+[.!?]*')`, trimmed, empties
    * dropped. An approximation by design ("Dr. Smith" splits): the
    * downstream signals (sentence count, mean sentence length — the
    * C4/Gopher-class quality features) are robust to boundary noise,
    * and the same pattern runs unchanged in DuckDB for the oracle. */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)), trim(_)),
      s => s =!= "")

  /** Syllable estimate: count of vowel GROUPS (maximal `[aeiouy]+` runs,
    * case-folded) — the standard cheap approximation readability
    * formulas were calibrated against ("strength"→1, "idea"→2·, close
    * enough in aggregate). Exact integer count, RE2-portable. */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast(LongType)

  /** Flesch reading-ease (Flesch 1948, the readability band every
    * document-quality rubric quotes): 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words). Inputs are three exact integer counts
    * over the engine's own tokenizer/segmenter ([[tokenCount]],
    * [[sentences]], [[syllableCount]]).
    *
    * Computed as ONE exact-integer rational, (206835·ns·nw − 1015·nw² −
    * 84600·sy·ns) / (1000·ns·nw), then a single rounded quotient: the
    * three-term double form `206.835 − 1.015a − 84.6b` lands on 4th-
    * decimal half-way ties that Spark and DuckDB round apart (observed
    * live at sf0.1: 28.19375 → 28.1938 vs 28.1937); a single division of
    * identical int64s yields the identical double in both engines. Exact
    * in int64 for counts up to ~3·10⁶ tokens/doc (a 206835·ns·nw term at
    * 3e6² words·sentences is still < 2⁶³ only when docs are chunk-sized;
    * chunk first — [[graft.operators.Chunker]] — for book-length inputs).
    * Degenerate docs (no sentences / no words) surface NULL, never a
    * divide-by-zero (the q133 divisor rule). Narrow per-row arithmetic —
    * no shuffle. */
  def fleschReadingEase(text: Column, sents: Column, toks: Column): Column = {
    val nw = size(toks).cast(LongType)
    val ns = size(sents).cast(LongType)
    val sy = syllableCount(text)
    val num = lit(206835L) * ns * nw - lit(1015L) * nw * nw - lit(84600L) * sy * ns
    val den = lit(1000L) * ns * nw
    round(num.cast("double") / nullif(den, lit(0L)), 4)
  }

  /** The script blocks the profiler counts — explicit BMP code-point
    * ranges, NOT `\p{...}` classes: Java and RE2 spell script classes
    * differently (`\p{IsCyrillic}` vs `\p{Cyrillic}`), while a literal
    * character range means the same thing in both engines. Basic blocks
    * only (the homoglyph-relevant ones); extension blocks are additive
    * follow-ups. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cyrillic" -> "Ѐ-ӿ",
    "greek" -> "Ͱ-Ͽ",
    "cjk" -> "一-鿿",
    "arabic" -> "؀-ۿ")

  /** Per-script letter count: occurrences of [[ScriptRanges]] block
    * `name` in the text — `length − length(strip(block))`, a narrow
    * per-row expression with no regex backtracking hazard (a character
    * class is RE2-linear by construction). */
  def scriptCount(text: Column, name: String): Column = {
    val range = ScriptRanges.toMap.getOrElse(name,
      throw new IllegalArgumentException(
        s"scriptCount: unknown script '$name' (have ${ScriptRanges.map(_._1)})"))
    (length(text) - length(regexp_replace(text, s"[$range]", "")))
      .cast(LongType)
  }

  /** Count of DISTINCT scripts present (≥1 letter each) — `≥ 2` is the
    * mixed-script flag: legitimate text mixes scripts occasionally
    * (quotes, names), but a LATIN-dominant string with a few Cyrillic
    * letters is the homoglyph-spoofing shape (кyrillic 'о' in a domain,
    * fabricated near-dup evasion), and corpus QA wants those surfaced.
    * Callers gate on `scriptsPresent(text) >= 2` plus their dominance
    * policy over the per-script counts. */
  def scriptsPresent(text: Column): Column =
    ScriptRanges.map { case (n, _) =>
      when(scriptCount(text, n) > 0, 1L).otherwise(0L)
    }.reduce(_ + _)

  /** Jaro-Winkler similarity in [0, 1] — the linkage-standard comparator
    * for short name-like fields (front-weighted, transposition-tolerant).
    * Backed by the codegen'd [[graft.expressions.JaroWinkler]] kernel,
    * pinned to the DuckDB/RapidFuzz byte-level contract so oracle replays
    * agree; see the expression doc for the exact semantics. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(graft.expressions.JaroWinkler(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
  }

  /** Code-vs-prose heuristic score in [0, 1] — the pretraining corpus
    * router (code wants different dedup/quality/tokenizer settings than
    * prose, and crawls interleave them): structural-symbol density
    * ([]{}();=<>, strip-and-diff counted) and code-keyword token rate
    * (def/return/import/...), each saturating, fixed 0.6/0.4 blend,
    * rounded to 4. Narrow expressions only — both signals replay
    * verbatim in the oracle. Scores text with no tokens as 0. */
  def codeScore(text: Column): Column = {
    val n = length(text).cast("double")
    val sym = (length(text) -
      length(regexp_replace(text, "[\\[\\]{}();=<>]", ""))).cast("double")
    val toks = filter(split(lower(text), "\\s+"), w => w =!= "")
    val nt = size(toks).cast("double")
    val kws = Seq("def", "return", "import", "var", "val", "if", "else",
      "for", "while", "class", "function")
    val kw = size(filter(toks, w => w.isin(kws.map(lit): _*))).cast("double")
    when(n > 0 && nt > 0,
      round(least(sym / n * 6.0, lit(1.0)) * 0.6 +
        least(kw / nt * 8.0, lit(1.0)) * 0.4, 4))
      .otherwise(lit(0.0))
  }
}
