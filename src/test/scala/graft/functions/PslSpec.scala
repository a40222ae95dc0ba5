package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Psl.registrableDomain]] — publicsuffix.org longest-match semantics
  * against the pinned snapshot: multi-label registries beat their TLD,
  * private registries beat their parent domain, suffix-only hosts have
  * no registrable domain, unknown TLDs fall to the default `*` rule. */
class PslSpec extends SparkSpecBase {

  private def rd(hosts: Seq[String]): Seq[Option[String]] = {
    val s = spark
    import s.implicits._
    hosts.toDF("h")
      .select(Psl.registrableDomain(col("h")).as("rd"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("longest suffix wins: second-level registries and private registries") {
    assert(rd(Seq(
      "www.example.com",        // com -> example.com
      "a.b.news.co.uk",         // co.uk beats uk -> news.co.uk
      "x.y.shop.com.au",        // com.au -> shop.com.au
      "user.github.io",         // github.io (private) beats io -> user.github.io
      "deep.sub.user.github.io" // still user.github.io
    )) === Seq(Some("example.com"), Some("news.co.uk"), Some("shop.com.au"),
      Some("user.github.io"), Some("user.github.io")))
  }

  test("a host that IS a public suffix has no registrable domain") {
    assert(rd(Seq("co.uk", "github.io", "com")) === Seq(None, None, None))
  }

  test("wildcard rules: *.ck makes every label.ck a registry; !www.ck carves the exception") {
    assert(rd(Seq(
      "shop.foo.ck",     // *.ck matches foo.ck -> registrable shop.foo.ck
      "a.b.shop.foo.ck", // same winning rule, deeper host
      "foo.ck",          // host IS a wildcard public suffix -> none
      "www.ck",          // exception: www.ck is registrable itself
      "sub.www.ck",      // exception matches mid-host -> www.ck
      "ck"               // bare zone: no rule consumes it -> default, single label -> none
    )) === Seq(Some("shop.foo.ck"), Some("shop.foo.ck"), None,
      Some("www.ck"), Some("www.ck"), None))
  }

  test("unknown TLD: the PSL default rule takes the last two labels; single label none") {
    assert(rd(Seq("a.b.host.internal", "host.internal", "localhost")) ===
      Seq(Some("host.internal"), Some("host.internal"), None))
  }

  test("null host stays null") {
    val s = spark
    import s.implicits._
    val out = Seq((1, Option.empty[String])).toDF("id", "h")
      .select(Psl.registrableDomain(col("h")).as("rd")).collect()
    assert(out.head.isNullAt(0))
  }

  test("the SQL literals partition and render every pinned rule verbatim") {
    // the oracle matches against the interpolated literals — a quoting
    // or partitioning bug would silently diverge the engines
    val (plain, wild, exc) = Psl.partitionRules(Psl.Snapshot)
    assert(plain.size + wild.size + exc.size === Psl.Snapshot.size)
    plain.foreach(s => assert(Psl.snapshotSqlList.contains(s"'$s'"), s))
    wild.foreach(s => assert(Psl.wildcardTailSqlList.contains(s"'$s'"), s))
    exc.foreach(s => assert(Psl.exceptionSqlList.contains(s"'$s'"), s))
    assert(wild === Seq("ck") && exc === Seq("www.ck"), "rule-syntax prefixes stripped")
    assert(Psl.Snapshot.distinct.size === Psl.Snapshot.size, "duplicate suffixes")
    assert(Psl.Snapshot.forall(s => !s.contains("'")), "quote-unsafe suffix")
  }
}
