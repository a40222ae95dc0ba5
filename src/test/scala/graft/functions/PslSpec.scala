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

  test("the SQL literal renders every pinned suffix verbatim") {
    // the oracle matches against the interpolated literal — a quoting
    // bug would silently diverge the engines
    val lit = Psl.snapshotSqlList
    assert(lit.startsWith("[") && lit.endsWith("]"))
    Psl.Snapshot.foreach(sfx => assert(lit.contains(s"'$sfx'"), sfx))
    assert(Psl.Snapshot.distinct.size === Psl.Snapshot.size, "duplicate suffixes")
    assert(Psl.Snapshot.forall(s => !s.contains("'")), "quote-unsafe suffix")
  }
}
