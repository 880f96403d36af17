package graft

import graft.functions.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u").select(Urls.canonicalUrl($"u")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def domain(url: String): String =
    Seq(url).toDF("u").select(Urls.domainOf($"u")).collect()(0).getString(0)

  test("canonicalUrl: case, www, default ports, fragments, tracking params, param order") {
    assert(canon("HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/Path?a=1&b=2")
    // Path case is NOT folded (paths are case-sensitive on real servers).
    assert(canon("https://example.com:443/A/B") == "https://example.com/A/B")
    // Non-default ports survive; default port of the OTHER scheme survives.
    assert(canon("https://example.com:8443/p") == "https://example.com:8443/p")
    assert(canon("http://example.com:443/p") == "http://example.com:443/p")
    // Param sorting makes order-variants identical.
    assert(canon("https://e.com/p?b=2&a=1") == canon("https://e.com/p?a=1&b=2"))
    // All-tracking query collapses to no query at all.
    assert(canon("https://e.com/p?utm_campaign=c&fbclid=f&gclid=g&ref=r&mc_cid=m")
      == "https://e.com/p")
    // Root URL: trailing slash trimmed to the bare authority.
    assert(canon("https://e.com/") == "https://e.com")
    // Non-URLs canonicalize to null, never to garbage.
    assert(canon("not a url") == null)
    assert(canon("") == null)
  }

  test("domainOf: grouping key is portless, www-less, lowercase") {
    assert(domain("HTTP://WWW.Example.COM:80/x") == "example.com")
    assert(domain("https://Sub.Example.com:8443/x") == "sub.example.com")
    assert(domain("https://example.com/x") == "example.com")
    assert(domain("nope") == "")
  }
}
