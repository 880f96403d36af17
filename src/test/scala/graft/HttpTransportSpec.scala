package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.{FeedReader, HttpSource}

/** End-to-end tests for the REAL `java.net.http` transports against a
  * loopback `com.sun.net.httpserver` fixture — the code path a
  * deployment opts into via `forName("http")` (S4) and the
  * `graft-paged` DSv2 http mode (E4), exercised inside the sandbox:
  * Bearer-auth enforcement, URL/query encoding, non-2xx failure
  * surfacing, per-page executor-side fetch, and JSONC stripping over
  * the wire. Payloads are the MidOcean sample capture's own products
  * section (ref: midocean_extractor.py:140-173 — endpoint fetch with
  * Authorization header), so the served bodies are the reference's
  * real shapes, not toys. */
class HttpTransportSpec extends SparkSpec {
  import spark.implicits._

  private val token = "graft-test-token"
  private val samplePath = "/root/reference/sample data/MidOcean Sample Data.jsonc"
  private def sampleAvailable = new java.io.File(samplePath).exists()

  /** The sample capture's products section re-serialized as one clean
    * JSON array — what the reference's API would return for the
    * whole-response fetch. */
  private lazy val productsJson: String = {
    val rows = FeedReader.readSection(spark, samplePath, "products.Response")
      .toJSON.collect()
    "[" + rows.mkString(",") + "]"
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes) }
    ex.close()
  }

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $token")

  /** Loopback server with auth-checked /products, /echo (query
    * echo-back), and /pages/{n} endpoints; ephemeral port; 8 worker
    * threads so executor-parallel page fetches actually overlap. */
  private def withServer[T](pageBodies: Map[Int, String])(f: (Int, AtomicInteger) => T): T = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/products", (ex: HttpExchange) => {
      hits.incrementAndGet()
      if (!authed(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
      else respond(ex, 200, productsJson)
    })
    server.createContext("/echo", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      respond(ex, 200, s"""{"q":"$q"}""")
    })
    server.createContext("/pages/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      if (!authed(ex)) { respond(ex, 401, """{"error":"unauthorized"}"""); () }
      else {
        val n = ex.getRequestURI.getPath.stripPrefix("/pages/").toInt
        pageBodies.get(n) match {
          case Some(body) => respond(ex, 200, body)
          case None => respond(ex, 404, """{"error":"no such page"}""")
        }
      }
    })
    // Non-daemon pool: shut down explicitly (HttpServer.stop does not
    // stop a user-provided executor, and a leaked pool pins the JVM).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(pool)
    server.start()
    try f(server.getAddress.getPort, hits)
    finally { server.stop(0); pool.shutdown() }
  }

  test("S4: fetchJson over real java.net.http with Bearer auth parses the sample section") {
    assume(sampleAvailable)
    withServer(Map.empty) { (port, hits) =>
      val transport = HttpSource.forName("http", bearerToken = Some(token))
      val df = HttpSource.fetchJson(spark,
        HttpSource.HttpRequest(s"http://127.0.0.1:$port/products"), transport)
      // Same 5 master products the golden MidOcean spec pins, now
      // arriving over a socket instead of a file read.
      assert(df.count() == 5)
      assert(df.columns.contains("master_code"))
      assert(df.filter(col("master_code") === "AR1249").count() == 1)
      assert(hits.get() == 1)
    }
  }

  test("S4: a wrong or missing Bearer token surfaces as an HTTP 401 IOException") {
    assume(sampleAvailable)
    withServer(Map.empty) { (port, _) =>
      val bad = HttpSource.httpTransport(Some("wrong-token"))
      val e = intercept[java.io.IOException] {
        bad(HttpSource.HttpRequest(s"http://127.0.0.1:$port/products"))
      }
      assert(e.getMessage.contains("401"))
      val none = HttpSource.httpTransport(None)
      intercept[java.io.IOException] {
        none(HttpSource.HttpRequest(s"http://127.0.0.1:$port/products"))
      }
      // S7 probe through the same real transport: false on auth
      // failure, true with the right token.
      assert(!HttpSource.validate(
        HttpSource.HttpRequest(s"http://127.0.0.1:$port/products"), bad))
      assert(HttpSource.validate(
        HttpSource.HttpRequest(s"http://127.0.0.1:$port/products"),
        HttpSource.httpTransport(Some(token))))
    }
  }

  test("S4: query params are URL-encoded onto the request line") {
    withServer(Map.empty) { (port, _) =>
      val transport = HttpSource.httpTransport(None)
      val body = transport(HttpSource.HttpRequest(
        s"http://127.0.0.1:$port/echo",
        params = Map("a b" -> "c&d", "lang" -> "en")))
      val q = spark.read.json(Seq(body).toDS()).select("q").as[String].head()
      val parts = q.split("&").toSet
      assert(parts == Set("a+b=c%26d", "lang=en"), s"got $q")
    }
  }

  test("E4: graft-paged http mode fetches every page executor-side with auth and JSONC strip") {
    assume(sampleAvailable)
    // Three pages sliced from the sample's products section (2+2+1
    // rows), each served as JSONC — a line comment prepended — so the
    // jsonc=true strip runs over the wire like the capture files.
    val rows = FeedReader.readSection(spark, samplePath, "products.Response")
      .toJSON.collect().toSeq
    val pages = rows.grouped(2).zipWithIndex
      .map { case (g, i) => (i + 1) -> s"// page ${i + 1}\n[${g.mkString(",")}]" }
      .toMap
    withServer(pages) { (port, hits) =>
      val df = spark.read.format("graft-paged")
        .option("urlTemplate", s"http://127.0.0.1:$port/pages/{page}")
        .option("pages", "3")
        .option("transport", "http")
        .option("bearerToken", token)
        .option("jsonc", "true")
        .load()
      val parsed = df.select(col("page"),
          explode(from_json(col("body"), org.apache.spark.sql.types.DataType
            .fromDDL("array<struct<master_code:string>>"))).as("r"))
        .select(col("page"), col("r.master_code"))
      val got = parsed.collect().map(r => (r.getInt(0), r.getString(1)))
      assert(got.length == 5, s"expected 5 products across 3 pages, got ${got.length}")
      assert(got.map(_._1).distinct.sorted.toSeq == Seq(1, 2, 3))
      assert(got.map(_._2).toSet.contains("AR1249"))
      assert(hits.get() == 3, s"each page fetched exactly once, got ${hits.get()}")
    }
  }

  test("E4: graft-paged http mode surfaces a missing page as the task failure it is") {
    withServer(Map(1 -> """[{"sku":"A"}]""")) { (port, _) =>
      val df = spark.read.format("graft-paged")
        .option("urlTemplate", s"http://127.0.0.1:$port/pages/{page}")
        .option("pages", "2")
        .option("transport", "http")
        .option("bearerToken", token)
        .load()
      val e = intercept[Exception] { df.collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("404")),
        s"expected HTTP 404 in the failure chain: ${messages(e).mkString(" | ")}")
    }
  }

  test("E4: graft-paged http mode without a token is refused by the endpoint") {
    withServer(Map(1 -> """[{"sku":"A"}]""")) { (port, _) =>
      val df = spark.read.format("graft-paged")
        .option("urlTemplate", s"http://127.0.0.1:$port/pages/{page}")
        .option("pages", "1")
        .option("transport", "http")
        .load()
      val e = intercept[Exception] { df.collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("401")))
    }
  }
}
