package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleanup for corpus ingestion — normalization and PII redaction
  * as pure `Column → Column` transforms (codegen'd `regexp_replace` /
  * `translate` chains, no UDFs): the scrub pass that runs between raw
  * scrape and every analysis/dedup operator in this package.
  *
  * The regex subset is deliberately conservative — character classes,
  * alternation and bounded quantifiers only (no lookaround, no
  * backreferences) — so the same patterns run unchanged on RE2-family
  * engines (DuckDB, Go) for cross-engine verification.
  *
  * The test fixture corpus contains no PII by construction, so this
  * family is gated by literal-input unit tests (CleanSpec) rather than a
  * driver query — the honest gate for semantics the fixture cannot
  * exercise (the same stance as the multimodal decode stub).
  */
object Clean {

  /** Collapse runs of whitespace (incl. tabs/newlines) to single spaces
    * and trim the ends — the canonical form every tokenizer in this
    * package assumes. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Strip C0 control characters and DEL — scrape noise that breaks
    * downstream parsers. The five `\s`-class controls (tab, LF, VT, FF,
    * CR) are exempt: they are WHITESPACE and belong to
    * [[normalizeWhitespace]]'s jurisdiction — deleting them here would
    * merge the words they separate ("one\ftwo" → "onetwo") instead of
    * letting the collapse turn them into a single space. */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0e-\\x1f\\x7f]", "")

  /** Redact email addresses → `[EMAIL]`. */
  def redactEmails(c: Column): Column =
    regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")

  /** Redact http(s) URLs → `[URL]`. */
  def redactUrls(c: Column): Column =
    regexp_replace(c, "https?://[^\\s<>\"]+", "[URL]")

  /** Redact IPv4 literals → `[IP]`. */
  def redactIpv4(c: Column): Column =
    regexp_replace(c,
      "\\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
        "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\b", "[IP]")

  /** Redact phone-shaped digit runs (7+ digits allowing separators,
    * optional +country prefix) → `[PHONE]`. Runs AFTER [[redactIpv4]] in
    * [[redactPii]] so dotted quads aren't half-eaten as phone numbers. */
  def redactPhones(c: Column): Column =
    regexp_replace(c, "(?:\\+[0-9]{1,3}[ .-]?)?(?:\\(?[0-9]{2,4}\\)?[ .-]?){2,4}[0-9]{3,4}", "[PHONE]")

  /** The full scrub: URLs first (they may embed emails/digits), then
    * emails, IPs, phones — order matters, each later pass must not see
    * text a broader earlier pattern should have claimed. */
  def redactPii(c: Column): Column =
    redactPhones(redactIpv4(redactEmails(redactUrls(c))))

  /** Full ingest normalization: control-char strip then whitespace
    * collapse (strip first — a control char between spaces would
    * otherwise leave a double space behind). */
  def normalize(c: Column): Column =
    normalizeWhitespace(stripControlChars(c))

  /** HTML/markup → text: the extraction step between a raw crawl and
    * every text operator in this package. Deliberately the NAIVE
    * regex stripper (trafilatura-class boilerplate removal is a model,
    * not a regex) but the portable core is real: script/style blocks
    * drop WITH their content (code is not prose), then comments, then
    * tags (a tag must start `<` + letter / `/` / `!` — a bare "a < b"
    * in prose survives), each replaced by a space so `a</p><p>b` stays
    * two words; then the five-entity named decode (`&amp;` LAST, so
    * `&amp;lt;` single-decodes to the literal `&lt;`), then the
    * standard whitespace collapse. Same conservative RE2 subset as the
    * PII family — `(?is)` flags and non-greedy `.*?` run unchanged on
    * DuckDB/Go RE2 — so the whole chain is oracle-replayable (q131).
    * Numeric character references (`&#NN;`) are NOT decoded (that is
    * arithmetic, not substitution); they pass through as text. */
  def stripMarkup(c: Column): Column = {
    val blocksGone = regexp_replace(
      regexp_replace(
        regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val tagsGone = regexp_replace(blocksGone, "(?s)</?[A-Za-z!][^>]*>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(tagsGone, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&nbsp;", " "),
      "&amp;", "&")
    normalizeWhitespace(decoded)
  }

  /** Luhn mod-10 checksum validity (ISO/IEC 7812 — the check digit every
    * payment-card number carries) over a digit string: TRUE iff the
    * value is 13–19 digits and the doubled-alternate digit sum ≡ 0
    * (mod 10). The PRECISION tier of the PII family: a bare
    * `[0-9]{13,19}` match fires on order ids, timestamps and EANs;
    * candidates that fail Luhn are overwhelmingly NOT card numbers, so
    * gating redaction on this check cuts the false-positive mass while
    * keeping every real PAN (all issued cards validate by construction).
    *
    * Pure HOF column expression (sequence + substr over the reversed
    * string, aggregate sum) — codegen'd, no UDF, replays in ANSI SQL
    * with list lambdas. A non-digit char NULL-poisons the cast and the
    * predicate yields NULL (never TRUE) — callers feed regex-extracted
    * digit runs. */
  def luhnValid(c: Column): Column = {
    val r = reverse(c)
    val sum = aggregate(
      sequence(lit(1), length(c)),
      lit(0),
      (a, i) => {
        val d = r.substr(i, lit(1)).cast("int")
        val dd = when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        a + dd
      })
    length(c) >= 13 && length(c) <= 19 && pmod(sum, lit(10)) === 0
  }

  /** Redact exactly the Luhn-valid 13–19-digit runs in a text as
    * `<CC>`, leaving invalid runs (order ids, tracking numbers) intact —
    * [[redactPii]]'s precision-gated companion for card numbers.
    * Candidate extraction, validation and replacement are all per-row
    * HOF work (distinct candidates, then a fold of exact-literal
    * replaces), no shuffle, no UDF. */
  def redactValidCards(c: Column): Column = {
    val cands = array_distinct(
      regexp_extract_all(c, lit("[0-9]{13,19}"), lit(0)))
    val valid = filter(cands, p => luhnValid(p))
    aggregate(valid, c, (t, p) => replace(t, p, lit("<CC>")))
  }

  /** URL canonicalization — the identity a crawl ledger dedups ON
    * (URL-level dedup runs before any fetch or text dedup can): the
    * variants `HTTP://u@Host.COM:80/a/?utm_x=1#f` and
    * `http://host.com/a` are the same resource. Normalizations, in
    * order:
    *   1. scheme + host lowercased (path/query case is PRESERVED — it
    *      is significant on most servers);
    *   2. userinfo stripped; default port stripped (`:80` for http,
    *      `:443` for https — other ports are significant);
    *   3. fragment dropped (client-side only);
    *   4. tracking params dropped (`utm_*`, `fbclid`, `gclid`,
    *      `msclkid`) with separator repair — matched at a `?`/`&`
    *      boundary, so a legit param merely ENDING in one of these
    *      names survives;
    *   5. trailing path slashes dropped (root collapses to the bare
    *      authority — empty path ≡ `/`).
    * Param ORDER is preserved (sorting params is a site-specific
    * policy, not a safe default). Non-URLs (no `scheme://`) yield NULL
    * — absence, never "" (the [[TextOps.urlHost]] contract). Pure
    * regexp decomposition in the same RE2-portable subset as the PII
    * family — the whole chain replays in DuckDB (q145). Narrow per-row
    * work, no shuffle. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val tail = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val auth = regexp_extract(tail, "^([^/?#]*)", 1)
    val rest = regexp_replace(tail, "^[^/?#]*", "")
    val host = lower(regexp_replace(auth, "^.*@", ""))
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    val restNoFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(restNoFrag, "\\?.*$", "")
    val query = regexp_extract(restNoFrag, "(\\?.*)$", 1)
    val pathNorm = regexp_replace(path, "/+$", "")
    val queryStripped = regexp_replace(query,
      "(?i)[?&](?:utm_[a-z0-9_]*|fbclid|gclid|msclkid)=[^&]*", "")
    val queryNorm = regexp_replace(
      regexp_replace(queryStripped, "^&", "?"), "^\\?$", "")
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), hostNoPort, pathNorm, queryNorm))
  }

  // --- Mojibake (UTF-8 bytes mis-decoded as cp1252/latin-1) -----------
  //
  // The single most common crawl-text corruption: a UTF-8 document read
  // as Windows-1252 turns every non-ASCII char into a 2-3 char digraph
  // ("é" -> "Ã©", "'" -> "â€™", "€" -> "â‚¬"). The repair table below is
  // GENERATED from the encoding math, not hand-listed: for each original
  // code point, re-encode to UTF-8 and render each byte the way a cp1252
  // decoder would (0x80-0x9F via the cp1252 table, else the latin-1
  // identity) — so the table is complete over Latin-1 Supplement plus
  // the cp1252 punctuation block, and provably consistent.

  /** cp1252's 0x80–0x9F remappings (the 5 holes — 81 8D 8F 90 9D — fall
    * through to their C1 control chars, exactly like a real mis-decode). */
  private val Cp1252: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  private def disp(b: Int): String = Cp1252.getOrElse(b, b.toChar).toString

  /** (mojibake sequence → original char), 3-byte punctuation first, then
    * the full U+00A0–U+00FF family in ASCENDING code-point order — that
    * order makes the chain fix DOUBLE-encoded 2-byte chars too ("Ãƒ"→"Ã"
    * and "Â©"→"©" both land before "Ã©"→"é" re-examines the result;
    * spec-asserted). Replacement outputs never contain ASCII quotes, so
    * the table embeds directly into SQL literals for the oracle replay. */
  val mojibakeTable: Seq[(String, String)] = {
    val punct = Seq(0x2013, 0x2014, 0x2018, 0x2019, 0x201A, 0x201C, 0x201D,
      0x201E, 0x2020, 0x2021, 0x2022, 0x2026, 0x2030, 0x2039, 0x203A,
      0x20AC, 0x2122).map { cp =>
      (disp(0xE0 | (cp >> 12)) + disp(0x80 | ((cp >> 6) & 0x3F)) +
        disp(0x80 | (cp & 0x3F)), cp.toChar.toString)
    }
    val latin = (0xA0 to 0xFF).map { cp =>
      (disp(0xC0 | (cp >> 6)) + disp(0x80 | (cp & 0x3F)), cp.toChar.toString)
    }
    punct ++ latin
  }

  /** The detection regex: a UTF-8 lead-byte display char (Ã/Â for 2-byte
    * sequences, â for the punctuation 3-byte block) followed by
    * continuation-byte display chars. Pure literal character classes
    * (all 64 continuation renderings enumerated — no ranges, no
    * metacharacters), identical under Java regex and RE2, shared
    * verbatim with the q152 oracle. */
  val mojibakeRe: String = {
    val cont = (0x80 to 0xBF).map(disp).mkString
    s"Ã[$cont]|Â[$cont]|â[$cont]{2}"
  }

  /** Count of mojibake signatures in the text — the triage signal (docs
    * scoring high route to [[fixMojibake]] or to quarantine). */
  def mojibakeScore(c: Column): Column =
    size(regexp_extract_all(c, lit(mojibakeRe), lit(0)))

  /** One pass of the repair table (unit of [[fixMojibake]]). */
  private def fixMojibakeOnce(c: Column): Column =
    mojibakeTable.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Repair mis-decoded text by folding [[mojibakeTable]] through literal
    * `replace` (codegen'd, no regex) TWICE: one pass is complete over
    * single-encoded Latin-1 Supplement + cp1252 punctuation, and the
    * second pass finishes DOUBLE-encoded text — a single ascending-order
    * pass repairs doubles only for originals above the table's lead
    * bytes ("ÃƒÂ©"→"é" works because E9 > C3, but "Ã‚Â©" exits pass one
    * as "Â©" since A9 < C2 had already been applied); the second pass
    * sees only residual mojibake, and clean text is a fixed point, so
    * the double application is idempotent on repaired output. Deeper
    * (triple+) encodings are out of contract. Never touches clean text
    * (every search key contains a lead-byte display char); narrow
    * per-row work. */
  def fixMojibake(c: Column): Column =
    fixMojibakeOnce(fixMojibakeOnce(c))

  /** URL path-template mining key (the crawl-ops "which page TEMPLATES
    * dominate this host" rollup: /item/123/view and /item/987/view are
    * one template; per-template counts expose crawler traps — calendar
    * pages, session-id explosions — and pick what to de-prioritize).
    * Strips scheme://authority, query and fragment, then collapses
    * within each path segment: 6+-char hex runs → `{h}` (ids/digests —
    * checked FIRST, a hex run is also digit-bearing), then digit runs →
    * `{n}`. Pure narrow regexp chain (RE2-linear), replayed verbatim by
    * the oracle. NULL/empty input templates to '(none)'. */
  def urlPathTemplate(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*", "")
    val path = regexp_replace(regexp_replace(noScheme, "\\?.*$", ""), "#.*$", "")
    val hexed = regexp_replace(path, "(?<=/)[0-9a-fA-F]{6,}(?=/|$)", "{h}")
    val templ = regexp_replace(hexed, "[0-9]+", "{n}")
    when(url.isNull || templ === "", lit("(none)")).otherwise(templ)
  }
}
