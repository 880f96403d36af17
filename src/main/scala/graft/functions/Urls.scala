package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for corpus curation — the primitives behind
  * per-domain mixing caps, domain-level dedup, and crawl-frontier
  * hygiene in web-scale training pipelines (one canonical form per
  * logically-identical page, one domain key per site).
  *
  * Everything is codegen'd Spark built-ins (regex + higher-order
  * array functions, no UDFs), and deliberately uses an explicit
  * regex grammar rather than `parse_url` so an external SQL engine
  * can replay the exact canonicalization for verification — the same
  * replayability contract as [[TextAnalysis.normalized]].
  *
  * Canonicalization rules (the conventional web-dedup set):
  * scheme and host lowercase; leading `www.` stripped; default ports
  * (`:80` http, `:443` https) stripped; fragment dropped; tracking
  * parameters (`utm_*`, `fbclid`, `gclid`, `mc_cid`/`mc_eid`, `ref`)
  * dropped; surviving query parameters SORTED (so `?b=2&a=1` and
  * `?a=1&b=2` canonicalize identically); trailing path slashes
  * trimmed. Non-URL strings (no `scheme://`) canonicalize to null —
  * filter or coalesce downstream. */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|mc_cid|mc_eid|ref)="

  /** Lowercased scheme, "" when the string is not a URL. */
  def schemeOf(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased authority (host[:port]), "" when not a URL. */
  private def authorityOf(url: Column): Column =
    lower(regexp_extract(url, AuthorityRe, 1))

  /** Registrable-ish domain key: lowercased host, `www.` and any
    * explicit port stripped — the grouping key for per-domain caps
    * and domain-level stats. "" when the string is not a URL. */
  def domainOf(url: Column): Column =
    regexp_replace(regexp_replace(authorityOf(url), ":[0-9]+$", ""), "^www\\.", "")

  /** Canonical form per the object doc; null for non-URL strings. */
  def canonicalUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val hostPort = regexp_replace(authorityOf(url), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    val kept = array_sort(filter(
      split(regexp_extract(url, QueryRe, 1), "&"),
      p => p =!= "" && !p.rlike(TrackingRe)))
    val query = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }
}
