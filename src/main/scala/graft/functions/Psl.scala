package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain (eTLD+1) derivation against a pinned public-suffix
  * snapshot — the missing half of [[TextOps.urlHost]]'s crawl ledger:
  * per-HOST accounting over-fragments (every subdomain its own bucket)
  * and per-TLD accounting under-fragments (all of .co.uk one bucket);
  * domain caps, robots ledgers and source-mix audits key on the
  * REGISTRABLE domain, the label immediately left of the longest
  * matching public suffix.
  *
  * Algorithm (publicsuffix.org semantics, longest-match subset):
  *  1. every dot-suffix of the host is a candidate; the longest one
  *     present in the suffix set wins;
  *  2. registrable = winning suffix plus one label to its left;
  *  3. a host that IS a public suffix has no registrable domain (NULL);
  *  4. no rule matches → the PSL default `*` rule: the last label is the
  *     TLD, registrable = last two labels.
  * Wildcard (`*.ck`) and exception (`!www.ck`) rules are out of this
  * subset's scope — they cover a handful of zones; swap in a fuller
  * snapshot via the `suffixes` parameter if those matter.
  *
  * Scale shape: the suffix set rides the PLAN as a literal array (a few
  * hundred strings — model state, like the k-means centroids), so the
  * whole derivation is one narrow codegen'd projection: no UDF, no
  * explode, no join, no shuffle. Per row it is |labels| slice-joins ×
  * one array_contains each — bounded by the host's label count (≤ ~8 in
  * real crawls). The same longest-match fold replays in SQL (q166).
  *
  * [[Snapshot]] is a pinned subset of the Mozilla Public Suffix List
  * (publicsuffix.org, MPL-2.0 — public data): the global gTLDs, the
  * high-traffic ccTLDs with their second-level registries, and the
  * common private registries (github.io etc.). It is deliberately a
  * VALUE, not a config file: the derivation must be a pure function of
  * the pinned snapshot or two runs of the same pipeline disagree. */
object Psl {

  /** Pinned public-suffix snapshot (subset; see object doc). */
  val Snapshot: Seq[String] = Seq(
    // global TLDs
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "dev", "app", "xyz", "me", "tv", "cc", "ai",
    // ccTLDs
    "us", "uk", "de", "fr", "jp", "cn", "au", "ca", "br", "in", "ru",
    "nl", "it", "es", "se", "ch", "at", "be", "dk", "fi", "no", "pl",
    "pt", "cz", "gr", "hu", "ie", "il", "kr", "mx", "nz", "sg", "tw",
    "za", "ar", "cl", "co", "id", "th", "tr", "ua", "vn", "hk",
    // second-level registries
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in", "edu.in", "gov.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "com.tr", "com.sg", "com.tw", "com.hk", "com.ua", "com.vn",
    "co.za", "org.za", "web.za", "ac.za", "gov.za",
    "co.il", "org.il", "ac.il", "gov.il",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    "co.th", "ac.th", "or.th", "in.th", "go.th",
    "com.ru", "net.ru", "org.ru",
    // private registries (PSL PRIVATE section)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "cloudfront.net", "amazonaws.com", "netlify.app",
    "vercel.app", "web.app", "firebaseapp.com", "azurewebsites.net",
    "pages.dev", "workers.dev", "wordpress.com", "tumblr.com")

  /** eTLD+1 of an already-extracted, lowercased host ([[TextOps.urlHost]]
    * output), or NULL when the host has none (is itself a public suffix,
    * or a single label under the default rule). */
  def registrableDomain(host: Column, suffixes: Seq[String] = Snapshot): Column = {
    require(suffixes.nonEmpty, "registrableDomain: empty suffix set")
    val sufLit = array(suffixes.map(lit): _*)
    val ls = split(host, "\\.")
    val n = size(ls)
    // 1-based start index of every dot-suffix; keep those in the set
    val matchStarts = filter(sequence(lit(1), n), i =>
      array_contains(sufLit, array_join(slice(ls, i, n - i + 1), ".")))
    // longest match = smallest start
    val best = array_min(matchStarts)
    when(host.isNull || n < 1, lit(null).cast("string"))
      .when(best === 1, lit(null).cast("string"))            // host IS a suffix
      .when(best.isNotNull, array_join(slice(ls, best - 1, n - best + 2), "."))
      .when(n >= 2, array_join(slice(ls, n - 1, lit(2)), ".")) // default `*` rule
      .otherwise(lit(null).cast("string"))
  }

  /** The snapshot as a SQL list literal — interpolate into oracle
    * queries so both engines match against the IDENTICAL pinned set. */
  def snapshotSqlList: String =
    Snapshot.map(s => s"'$s'").mkString("[", ", ", "]")
}
