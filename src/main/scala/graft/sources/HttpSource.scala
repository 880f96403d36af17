package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 — HTTP API scan shape (ref: midocean_extractor.py:140-173):
  * driver-side fetch of a bounded API response, parallelized into a
  * DataFrame via the JSON reader. The transport is pluggable — this
  * environment has zero egress, so the default transport refuses and
  * tests inject a file-backed one; swapping in a real HTTP client
  * changes one function.
  *
  * Scale note: this shape is for KB–MB dimension endpoints (pricelist,
  * printdata — the reference only ever fetches whole responses). The
  * paginated-bulk-API scale path is [[PagedJsonSource]]: a DataSource
  * V2 `TableProvider` with one InputPartition per page
  * (`spark.read.format("graft-paged")`).
  */
object HttpSource {

  type Transport = HttpRequest => String
  case class HttpRequest(url: String, headers: Map[String, String] = Map.empty,
                         params: Map[String, String] = Map.empty)

  /** Default transport: refuses (offline environment). */
  val offline: Transport = req =>
    throw new UnsupportedOperationException(
      s"no network transport configured (offline build); requested ${req.url}")

  /** File-backed transport for tests/sample mode: url → local path
    * lookup, mirroring `use_sample_data` (S8;
    * midocean_extractor.py:37-38). */
  def fileTransport(spark: SparkSession, mapping: Map[String, String]): Transport = req =>
    mapping.get(req.url) match {
      case Some(path) => FeedReader.loadText(spark, path)
        .map(FeedReader.stripJsonc)
        .getOrElse(throw new java.io.FileNotFoundException(path))
      case None => throw new IllegalArgumentException(s"no mapping for ${req.url}")
    }

  /** Real transport over `java.net.http` (JDK built-in, no added
    * dependency). DEFAULT-OFF: nothing selects it implicitly — the
    * offline default stands until a deployment opts in via
    * [[forName]]("http"). Bearer auth mirrors the reference's
    * Authorization header (midocean_extractor.py:140-173); non-2xx →
    * IOException (the reference raises for status). */
  def httpTransport(bearerToken: Option[String] = None,
                    timeoutSeconds: Long = 30): Transport = req => {
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val query =
      if (req.params.isEmpty) ""
      else req.params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
        .mkString(if (req.url.contains("?")) "&" else "?", "&", "")
    val timeout = java.time.Duration.ofSeconds(timeoutSeconds)
    val builder = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(req.url + query))
      .timeout(timeout).GET()
    req.headers.foreach { case (k, v) => builder.header(k, v) }
    bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL).build()
    val resp = client.send(builder.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from ${req.url}")
    resp.body()
  }

  /** Config-driven transport selection (S8): "offline" (default) or
    * "http"; unknown names fail loudly rather than silently going
    * offline. */
  def forName(name: String, bearerToken: Option[String] = None): Transport =
    name match {
      case "offline" | "" => offline
      case "http" => httpTransport(bearerToken)
      case other => throw new IllegalArgumentException(
        s"unknown transport '$other' (offline|http)")
    }

  /** Fetch one endpoint and parse the JSON response body. */
  def fetchJson(spark: SparkSession, req: HttpRequest,
                transport: Transport = offline): DataFrame = {
    import spark.implicits._
    val body = transport(req)
    spark.read.json(Seq(body).toDS())
  }

  /** S7 probe against an endpoint. */
  def validate(req: HttpRequest, transport: Transport = offline): Boolean =
    try transport(req).trim.nonEmpty
    catch { case _: Exception => false }
}
