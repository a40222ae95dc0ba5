package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Crawl.robotsDecisions]] — the RFC 9309 decision rules on hand
  * fixtures: longest prefix wins, allow beats deny at equal length,
  * default allow, host scoping, invalid URLs surfaced. */
class CrawlSpec extends SparkSpecBase {

  private def run(urls: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    val rules = Seq(
      (1L, "a.com", false, "/private/"),
      (2L, "a.com", true, "/private/open/"),
      (3L, "a.com", true, "/p"),
      (4L, "a.com", false, "/p"),       // equal-length conflict with 3
      (5L, "b.com", false, "/"))
      .toDF("rule_id", "host", "allow", "prefix")
    Crawl.robotsDecisions(urls.toDF("doc_id", "url"), rules)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(3), Option(r.getString(4))))).toMap
  }

  test("longest match wins; allow beats deny at equal length; default allow") {
    val out = run(Seq(
      (1L, "https://a.com/private/secret"),      // deny (/private/)
      (2L, "https://a.com/private/open/file"),   // allow (longer rule 2)
      (3L, "https://a.com/pX"),                  // rules 3&4 tie -> allow
      (4L, "https://a.com/other"),               // no match -> default allow
      (5L, "https://b.com/anything"),            // deny-all host
      (6L, "https://c.com/whatever"),            // unknown host -> allow
      (7L, "nonsense")))                         // invalid
    assert(out(1L) === (("deny", Some("/private/"))))
    assert(out(2L) === (("allow", Some("/private/open/"))))
    assert(out(3L) === (("allow", Some("/p"))))
    assert(out(4L) === (("allow", None)))
    assert(out(5L) === (("deny", Some("/"))))
    assert(out(6L) === (("allow", None)))
    assert(out(7L) === (("invalid", None)))
  }

  test("urlPath: root default, query/fragment cut, case preserved, null on non-URL") {
    val s = spark
    import s.implicits._
    val got = Seq("https://x.com", "https://x.com/A/B?q=1#f",
        "HTTP://x.com/Mixed/Case", "mailto:a@b")
      .toDF("u").select(graft.functions.TextOps.urlPath(col("u")).as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("/"), Some("/A/B"), Some("/Mixed/Case"), None))
  }
}
