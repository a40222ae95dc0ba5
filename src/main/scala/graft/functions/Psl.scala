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
  * Algorithm (publicsuffix.org semantics — FULL rule grammar):
  *  1. rules use the PSL file syntax: plain (`com`, `co.uk`), wildcard
  *     (`*.ck` — any single label in the `*` position is a public
  *     suffix), exception (`!www.ck` — carves that exact domain back
  *     OUT of a wildcard: it is registrable, its tail is the suffix);
  *  2. an exception rule beats everything; otherwise the longest match
  *     wins;
  *  3. registrable = winning public suffix plus one label to its left
  *     (for an exception, the exception itself);
  *  4. a host that IS a public suffix has no registrable domain (NULL);
  *  5. no rule matches → the PSL default `*` rule: the last label is
  *     the TLD, registrable = last two labels.
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
    // wildcard + exception zones (the canonical PSL pair: every
    // <label>.ck is a registry, except www.ck which is registrable)
    "*.ck", "!www.ck",
    // private registries (PSL PRIVATE section)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "cloudfront.net", "amazonaws.com", "netlify.app",
    "vercel.app", "web.app", "firebaseapp.com", "azurewebsites.net",
    "pages.dev", "workers.dev", "wordpress.com", "tumblr.com")

  /** Split a PSL rule list into (plain suffixes, wildcard TAILS — the
    * part after `*.`, exception DOMAINS — the part after `!`). */
  private[graft] def partitionRules(rules: Seq[String]): (Seq[String], Seq[String], Seq[String]) = {
    val (exc, rest) = rules.partition(_.startsWith("!"))
    val (wild, plain) = rest.partition(_.startsWith("*."))
    (plain, wild.map(_.drop(2)), exc.map(_.drop(1)))
  }

  /** eTLD+1 of an already-extracted, lowercased host ([[TextOps.urlHost]]
    * output), or NULL when the host has none (is itself a public suffix,
    * or a single label under the default rule). */
  def registrableDomain(host: Column, suffixes: Seq[String] = Snapshot): Column = {
    require(suffixes.nonEmpty, "registrableDomain: empty suffix set")
    val (plain, wildTails, exceptions) = partitionRules(suffixes)
    // BIND the label array once per row: the whole derivation references
    // `ls` dozens of times (every candidate start × three rule classes),
    // and expression trees re-evaluate a repeated subtree at every
    // position — when `host` is itself regex-derived (urlHost), that
    // multiplied a regex per reference (measured ~1 ms/row on q166).
    // A single-element transform() makes `ls` a lambda VARIABLE — split
    // runs once, every reference is a variable read. Catalyst has no
    // let-binding; this is the idiom.
    element_at(transform(array(split(host, "\\.")), ls => body(ls, host, plain, wildTails, exceptions)), 1)
  }

  private def body(
      ls: Column, host: Column,
      plain: Seq[String], wildTails: Seq[String], exceptions: Seq[String]): Column = {
    val n = size(ls)
    def fromI(i: Column) = array_join(slice(ls, i, n - i + lit(1)), ".")
    // an EMPTY rule class contributes no match, as a typed null (never
    // a sentinel value a pathological host label could collide with).
    // isInCollection, NOT array_contains over an array literal: the IN
    // list optimizes to an InSet hash probe (O(1) per candidate), while
    // a literal array inside a lambda body is rebuilt per evaluation —
    // measured 5.2 s -> 0.6 s on the q166 sf0.1 scan
    def bestMatch(xs: Seq[String], starts: Column, probe: Column => Column): Column =
      if (xs.isEmpty) lit(null).cast("int")
      else array_min(filter(starts, i => probe(i).isInCollection(xs)))
    // exception rule: slice(i..n) == some exception — the exception
    // itself is the registrable domain, at any i (overrides everything)
    val excBest = bestMatch(exceptions, sequence(lit(1), n), fromI)
    // plain rule: slice(i..n) in the set — public suffix starts at i
    val plainBest = bestMatch(plain, sequence(lit(1), n), fromI)
    // wildcard rule `*.tail`: label i + slice(i+1..n) == tail — the
    // public suffix starts at i (consumes the wildcard label), so the
    // tail must start at i+1 and i needs a label to consume (i <= n-1).
    // The i <= n-1 predicate guard matters: Spark's sequence(1, 0) for
    // a single-label host is DESCENDING [1, 0], not empty, and an
    // unguarded probe at i=0 would let the bare zone match its own tail
    val wildBest = bestMatch(wildTails,
      filter(sequence(lit(1), greatest(n - 1, lit(1))), i => i >= 1 && i <= n - 1),
      i => fromI(i + 1))
    // longest non-exception match = smallest start (least skips nulls)
    val best = least(plainBest, wildBest)
    when(host.isNull || n < 1, lit(null).cast("string"))
      .when(excBest.isNotNull, fromI(excBest))
      .when(best === 1, lit(null).cast("string"))  // host IS a public suffix
      .when(best.isNotNull, fromI(best - 1))
      .when(n >= 2, fromI(n - 1))                  // default `*` rule
      .otherwise(lit(null).cast("string"))
  }

  /** The snapshot's PLAIN / WILDCARD-TAIL / EXCEPTION rule sets as SQL
    * list literals — interpolate into oracle queries so both engines
    * match against the IDENTICAL pinned set. */
  def snapshotSqlList: String = sqlList(partitionRules(Snapshot)._1)
  def wildcardTailSqlList: String = sqlList(partitionRules(Snapshot)._2)
  def exceptionSqlList: String = sqlList(partitionRules(Snapshot)._3)
  private def sqlList(xs: Seq[String]): String =
    // an empty rule class renders as a typed empty list, matching the
    // Scala side's no-match-null semantics (list_contains([], x) = false)
    if (xs.isEmpty) "[]::VARCHAR[]"
    else xs.map(s => s"'$s'").mkString("[", ", ", "]")
}
