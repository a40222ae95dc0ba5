package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Literal-input contracts for the cleanup/redaction family — the
  * fixture corpus contains no PII by construction, so this surface is
  * gated here rather than by a driver query. */
class CleanSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def apply1(f: Column => Column, s: String): String =
    Seq(Tuple1(s)).toDF("t").select(f(col("t")).as("r")).collect().head.getString(0)

  test("normalizeWhitespace collapses runs and trims") {
    assert(apply1(Clean.normalizeWhitespace, "  a\t\tb \n c  ") === "a b c")
    assert(apply1(Clean.normalizeWhitespace, "already clean") === "already clean")
  }

  test("stripControlChars removes C0/DEL noise but keeps \\s-class controls") {
    assert(apply1(Clean.stripControlChars, "a\u0000b\u0007c\u007fd") === "abcd")
    assert(apply1(Clean.stripControlChars, "a\tb\nc") === "a\tb\nc")
    // VT/FF/CR are whitespace: stripping them would merge words
    assert(apply1(Clean.stripControlChars, "one\u000btwo\u000cthree\rfour")
      === "one\u000btwo\u000cthree\rfour")
    assert(apply1(Clean.normalize, "page one\u000ctwo") === "page one two")
  }

  test("redactEmails") {
    assert(apply1(Clean.redactEmails, "mail me at jane.doe+x@sub.example.org ok")
      === "mail me at [EMAIL] ok")
    assert(apply1(Clean.redactEmails, "no at-sign here") === "no at-sign here")
  }

  test("redactUrls claims the whole URL including query strings") {
    assert(apply1(Clean.redactUrls, "see https://ex.com/a?b=c&d=e#f and more")
      === "see [URL] and more")
    assert(apply1(Clean.redactUrls, "plain http text") === "plain http text")
  }

  test("redactIpv4 matches real quads only") {
    assert(apply1(Clean.redactIpv4, "host 192.168.1.254 up") === "host [IP] up")
    assert(apply1(Clean.redactIpv4, "version 999.1.2.3 is not an ip")
      === "version 999.1.2.3 is not an ip")
  }

  test("redactPhones catches international and separator forms") {
    assert(apply1(Clean.redactPhones, "call +1 415-555-0199 today")
      === "call [PHONE] today")
    assert(apply1(Clean.redactPhones, "call (020) 7946 0958 today")
      === "call [PHONE] today")
  }

  test("redactPii composes without passes eating each other's matches") {
    val in = "from a@b.co via https://c.dd/e at 10.0.0.1 or +44 20 7946 0958"
    assert(apply1(Clean.redactPii, in) === "from [EMAIL] via [URL] at [IP] or [PHONE]")
  }

  test("normalize is idempotent") {
    val once = apply1(Clean.normalize, " a\u0000  b\u0007\t c ")
    assert(once === "a b c")
    assert(apply1(Clean.normalize, once) === once)
  }

  test("stripMarkup: blocks drop with content, tags become separators, entities decode") {
    assert(apply1(Clean.stripMarkup,
      "<html><head><script>var a = 1 < 2 && \"</div>\";</script>" +
        "<style>p { content: \"</p>\"; }</style></head>" +
        "<body><h1>Title</h1><p>one</p><p>two</p></body></html>")
      === "Title one two")
    // comments vanish, including commented-out tags
    assert(apply1(Clean.stripMarkup, "a <!-- <b>hidden</b>\nmore --> b") === "a b")
    // a tag is < + letter / '/' / '!': prose comparisons survive
    assert(apply1(Clean.stripMarkup, "if a < b then c > d") === "if a < b then c > d")
    // multi-line tags with attributes
    assert(apply1(Clean.stripMarkup, "x<div class=\"a\"\n data-y=\"z\">y</div>w")
      === "x y w")
  }

  test("stripMarkup: entity decode is single-pass with &amp; last; numeric refs pass through") {
    assert(apply1(Clean.stripMarkup, "&lt;tag&gt; &quot;q&quot; a&nbsp;b &amp; c")
      === "<tag> \"q\" a b & c")
    // &amp;lt; is the ESCAPED literal "&lt;" -- must decode exactly once
    assert(apply1(Clean.stripMarkup, "&amp;lt;not-a-tag&amp;gt;") === "&lt;not-a-tag&gt;")
    // decoded angle brackets must NOT be re-stripped as tags
    assert(apply1(Clean.stripMarkup, "&lt;script&gt;evil()&lt;/script&gt;")
      === "<script>evil()</script>")
    assert(apply1(Clean.stripMarkup, "&#65;&#x41;") === "&#65;&#x41;")
  }

  test("canonicalizeUrl: case-fold, userinfo/port/fragment/tracking/slash normalization") {
    val c = Clean.canonicalizeUrl _
    assert(apply1(c, "HTTP://User@WWW.Example.COM:80/Path/?utm_source=x#frag")
      === "http://www.example.com/Path")
    // path case is PRESERVED; non-default port is significant
    assert(apply1(c, "https://Host.com:8443/A/B") === "https://host.com:8443/A/B")
    // default https port strips; http's 443 does NOT
    assert(apply1(c, "https://h.com:443/x") === "https://h.com/x")
    assert(apply1(c, "http://h.com:443/x") === "http://h.com:443/x")
    // tracking params: leading, middle, trailing, all — separator repaired
    assert(apply1(c, "http://h.com/p?utm_a=1&keep=2") === "http://h.com/p?keep=2")
    assert(apply1(c, "http://h.com/p?keep=2&utm_a=1") === "http://h.com/p?keep=2")
    assert(apply1(c, "http://h.com/p?a=1&fbclid=x&b=2") === "http://h.com/p?a=1&b=2")
    assert(apply1(c, "http://h.com/p?gclid=x&msclkid=y") === "http://h.com/p")
    // a legit param merely ENDING in a tracked name survives
    assert(apply1(c, "http://h.com/p?xfbclid=1") === "http://h.com/p?xfbclid=1")
    // root collapses to bare authority; param order preserved
    assert(apply1(c, "http://h.com/") === "http://h.com")
    assert(apply1(c, "http://h.com/p?b=2&a=1") === "http://h.com/p?b=2&a=1")
  }

  test("canonicalizeUrl: non-URLs are NULL, never empty string") {
    val out = Seq(Tuple1("not a url")).toDF("t")
      .select(Clean.canonicalizeUrl(col("t")).as("r")).collect().head
    assert(out.isNullAt(0))
  }

  private def fix1(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Clean.fixMojibake(col("t")).as("r"))
      .collect().head.getString(0)

  private def score1(s: String): Int =
    Seq(Tuple1(s)).toDF("t").select(Clean.mojibakeScore(col("t")).as("r"))
      .collect().head.getInt(0)

  test("fixMojibake: the classic signatures repair to their originals") {
    assert(fix1("CafÃ© menÃ¼") === "Café menü")
    assert(fix1("donâ€™t") === "don’t")
    assert(fix1("â€œquotedâ€") === "“quoted”")
    assert(fix1("â‚¬5 naÃ¯ve") === "€5 naïve")
    assert(fix1("A â€“ B â€¦") === "A – B …")
  }

  test("fixMojibake: table generated from the encoding math round-trips ALL of latin-1 + cp1252 punct") {
    // for every (bad, good) pair, bad must be exactly how good's UTF-8
    // bytes render under a cp1252-with-C1-fallback decoder
    Clean.mojibakeTable.foreach { case (bad, good) =>
      val bytes = good.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(bad.length === bytes.length, s"$good render length")
      assert(fix1(bad) === good, s"$bad repairs to $good")
    }
  }

  test("fixMojibake: double-encoded text repairs for BOTH lead-byte families") {
    // é double-mis-decoded: C3 A9 -> "Ã©" -> UTF-8 again -> C3 83 C2 A9
    // -> rendered "Ãƒ" + "Â©" (pass one suffices: E9 > C3)
    assert(fix1("ÃƒÂ©") === "é")
    // © double-mis-decoded: C2 A9 -> "Â©" -> UTF-8 again -> C3 82 C2 A9
    // -> rendered "Ã‚" + "Â©" — needs the second pass (A9 < C2 was
    // already applied when pass one peeled the outer layer)
    assert(fix1("Ã‚Â©") === "©")
    // idempotence: re-fixing repaired text changes nothing
    assert(fix1("é © don’t") === "é © don’t")
  }

  test("fixMojibake/mojibakeScore: clean text untouched, score 0; corrupt text scores its hits") {
    val clean = "plain ascii, real accents: café – “quoted” €5"
    assert(fix1(clean) === clean)
    assert(score1(clean) === 0)
    assert(score1("CafÃ© donâ€™t Â»") === 3)
  }

  test("luhnValid: known PANs validate, near-misses and odd lengths fail") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("4111111111111111", true),   // Visa test number
      ("5555555555554444", true),   // Mastercard test number
      ("378282246310005", true),    // Amex test number (15 digits)
      ("4111111111111112", false),  // checksum broken by one
      ("1234567890123456", false),  // sequential order-id shape
      ("411111111111", false),      // 12 digits: below PAN range
      ("41111111111111111111", false)) // 20 digits: above PAN range
    val got = cases.map(_._1).toDF("pan")
      .select($"pan", Clean.luhnValid($"pan").as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (pan, want) => assert(got(pan) === want, pan) }
  }

  test("redactValidCards: valid PANs redacted everywhere, invalid runs untouched") {
    val s = spark
    import s.implicits._
    val txt = "pay 4111111111111111 or 4111111111111111 never 1234567890123456 end"
    val out = Seq(txt).toDF("t")
      .select(Clean.redactValidCards($"t")).as[String].head()
    assert(out === "pay <CC> or <CC> never 1234567890123456 end")
  }

  test("urlPathTemplate: segments collapse; hex before digits; edge inputs") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      "https://ex.com/item/123/view",
      "http://a.b/u/ab12ef98/profile?q=1#frag",
      "https://ex.com/about",
      "https://ex.com/d/2024/m/07/x9",
      "https://ex.com",
      "not a url at all",
      null.asInstanceOf[String]
    ).toDF("url")
    val out = df.select(Clean.urlPathTemplate(col("url")).as("t")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) === "/item/{n}/view")
    assert(out(1) === "/u/{h}/profile", "whole-segment hex wins over {n}")
    assert(out(2) === "/about")
    assert(out(3) === "/d/{n}/m/{n}/x{n}", "digit runs inside mixed segments")
    assert(out(4) === "(none)", "authority-only URL has an empty path")
    assert(out(5) === "not a url at all".replaceAll("[0-9]+", "{n}"),
      "non-URLs template as their literal text - never silently dropped")
    assert(out(6) === "(none)")
  }
}
