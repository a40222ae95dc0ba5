package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-exclusion evaluation (REP — RFC 9309): the allow/deny
  * decision a crawl pipeline applies to every URL before it may fetch,
  * and the audit a training-data provenance review re-runs over an
  * already-collected corpus ("was this page even allowed?"). Completes
  * the crawl-ledger tier: [[graft.functions.TextOps.urlHost]] keys the
  * ledger, [[graft.functions.Psl]] keys the caps, this gates the fetch.
  *
  * Semantics (RFC 9309 §2.2.2, the longest-match rule): among the
  * rules whose path is a PREFIX of the URL's path, the longest rule
  * wins; an allow and a disallow of equal length resolve to ALLOW; no
  * matching rule means allow (the default-permit stance). The `*`
  * wildcard / `$` anchor extensions are documented out of this subset —
  * real robots files are overwhelmingly plain prefixes, and prefix
  * matching keeps both engines' match predicates identical
  * (`startswith`, no LIKE-escape semantics to reconcile).
  *
  * Scale shape: the rule table is MODEL-sized by nature (a site's
  * robots group is tens of rules; a whole crawl's union is thousands) —
  * it broadcasts, the URL corpus streams once through the prefix-match
  * join, and the longest-match argmax runs on the TopK heap operator
  * (per-URL k=1, partial trim before the exchange). Default-allow rows
  * come back via one left anti-free join (left join + coalesce). */
object Crawl {

  /** Evaluate rules over URLs. `rules`: (rule_id, host, allow, prefix) —
    * a rule applies only to its host's URLs (the per-site grouping of a
    * real robots fetch; pass a single host + lit host column to evaluate
    * one file). Output: one row per input row —
    * (idCol, host, path, decision 'allow'|'deny'|'invalid',
    * matched_prefix NULL when no rule matched or the URL is invalid). */
  def robotsDecisions(
      urls: DataFrame,
      rules: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame = {
    val base = urls.select(col(idCol),
      graft.functions.TextOps.urlHost(col(urlCol)).as("host"),
      graft.functions.TextOps.urlPath(col(urlCol)).as("path"))
    val cand = base.where(col("path").isNotNull)
      .join(broadcast(rules.select(col("rule_id"), col("host").as("r_host"),
          col("allow"), col("prefix"))),
        col("host") === col("r_host") && col("path").startsWith(col("prefix")))
    // longest rule wins; allow beats deny at equal length (RFC 9309);
    // rule_id is the final tiebreaker for a total order
    val best = graft.plans.TopK.perKey(cand, Seq(col(idCol)),
      Seq(length(col("prefix")).desc, col("allow").desc, col("rule_id")), 1)
      .select(col(idCol), col("allow").as("__allow"),
        col("prefix").as("matched_prefix"))
    base.join(best, Seq(idCol), "left")
      .select(col(idCol), col("host"), col("path"),
        when(col("path").isNull, lit("invalid"))
          .when(coalesce(col("__allow"), lit(true)), lit("allow"))
          .otherwise(lit("deny")).as("decision"),
        col("matched_prefix"))
  }
}
