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

  test("domainChain: every >=2-label suffix, most-specific first") {
    val chain = Seq("https://a.b.c.com/x", "https://c.com/y", "nope")
      .toDF("u").select(Urls.domainChain($"u")).collect()
      .map(r => r.getSeq[String](0))
    assert(chain(0) == Seq("a.b.c.com", "b.c.com", "c.com"))
    assert(chain(1) == Seq("c.com"))
    assert(chain(2) == Seq.empty)
  }

  test("scrubDomains: blocklist entry catches the domain AND its subdomains") {
    val docs = Seq(
      (1L, "https://ok.com/a"),
      (2L, "https://bad.com/b"),          // direct hit
      (3L, "https://deep.sub.bad.com/c"), // subdomain of a blocked domain
      (4L, "https://sub.ok.com/d"),       // sibling subdomain survives
      (5L, "https://notbad.com/e"),       // label boundary: NOT a suffix match
      (6L, "no url here")                 // no URL -> no domain -> kept
    ).toDF("id", "url")
    val kept = Urls.scrubDomains(docs, $"id", $"url",
        Seq("bad.com").toDF("domain"))
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("domainStats: docs, weight, and weight_share summing to 1") {
    val docs = Seq(
      ("https://a.com/1", 10L), ("https://a.com/2", 30L),
      ("https://WWW.b.com/3", 60L))
      .toDF("url", "tokens")
    val stats = Urls.domainStats(docs, $"url", $"tokens")
      .orderBy($"domain").as[(String, Long, Long, Double)].collect().toSeq
    assert(stats == Seq(("a.com", 2L, 40L, 0.4), ("b.com", 1L, 60L, 0.6)))
  }

  test("hashSplit: deterministic, corpus-size-independent, roughly proportional") {
    import graft.operators.Sampling
    val full = spark.range(2000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.hashSplit(full, $"id", splits)
    val byLabel = assigned.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 1500 && byLabel("train") < 1700)
    assert(byLabel("val") > 120 && byLabel("val") < 280)
    // THE property: a doc's split is identical when computed over any
    // subset — held-out membership never shifts as the corpus grows.
    val subset = Sampling.hashSplit(
      spark.range(500).toDF("id"), $"id", splits)
    val joined = assigned.withColumnRenamed("split", "full_split")
      .join(subset, "id")
    assert(joined.filter($"full_split" =!= $"split").count() == 0)
    // Different seed -> different assignment (not degenerate).
    val reseeded = Sampling.hashSplit(full, $"id", splits, seed = "other")
      .withColumnRenamed("split", "re")
    assert(assigned.join(reseeded, "id")
      .filter($"split" =!= $"re").count() > 0)
  }
}
