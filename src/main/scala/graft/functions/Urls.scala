package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Every domain suffix with ≥ 2 labels, most-specific first:
    * `a.b.c.com` → `[a.b.c.com, b.c.com, c.com]`. The match key set
    * for blocklist scrubs — an entry for `c.com` must also catch
    * every subdomain, which as an equi-join means joining on each
    * suffix rather than regex-matching each blocklist row. Empty
    * array for non-URLs. */
  def domainChain(url: Column): Column = {
    val parts = split(domainOf(url), "\\.")
    when(size(parts) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(parts) - 1),
        i => array_join(slice(parts, i, size(parts) - i + 1), ".")))
  }

  /** Drop every document whose URL falls under a blocked domain —
    * `blocklist` is a one-column DataFrame of lowercase domains, and
    * an entry blocks the domain AND all its subdomains (the UT1/
    * crawl-hygiene convention).
    *
    * Scale shape: the suffix chain (≤ ~5 labels) explodes only a
    * two-column (id, suffix) projection — never the document rows —
    * then an equi semi-join against the blocklist (broadcast when it
    * is small, shuffled hash when it is millions of entries; either
    * way no per-row regex scan of the blocklist) yields the matched
    * id set, and one anti-join removes those documents. The matched
    * set is typically a small fraction of the corpus, so AQE turns
    * the anti-join into a broadcast at runtime. `id` must be unique
    * per document. */
  def scrubDomains(df: DataFrame, id: Column, url: Column,
                   blocklist: DataFrame): DataFrame = {
    require(blocklist.columns.length == 1,
      "blocklist must have exactly one (domain) column")
    val dcol = blocklist.columns.head
    val blocked = df.select(id.as("__scrub_id"),
        explode(domainChain(url)).as("__suffix"))
      .join(blocklist, col("__suffix") === col(dcol), "left_semi")
      .select(col("__scrub_id")).distinct()
    df.join(blocked, id === col("__scrub_id"), "left_anti")
  }

  /** Per-domain corpus accounting: document count, total weight
    * (pass a token count for token share), and each domain's share of
    * the corpus-wide weight — the input to per-domain caps and
    * over-representation review. One hash aggregate over the corpus;
    * the share's global total is a window over the already-aggregated
    * per-domain rows (domain cardinality, not corpus cardinality —
    * the single-partition window touches only that small result). */
  def domainStats(df: DataFrame, url: Column, weight: Column): DataFrame =
    df.groupBy(domainOf(url).as("domain"))
      .agg(count(lit(1)).as("docs"), sum(weight).as("weight"))
      .withColumn("weight_share",
        (col("weight").cast("double") /
          sum(col("weight")).over(Window.partitionBy())).cast("double"))
}
