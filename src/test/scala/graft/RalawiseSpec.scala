package graft

import org.apache.spark.sql.functions._
import graft.operators.Nest
import graft.sources.HttpSource

class NestSpec extends SparkSpec {
  import spark.implicits._

  test("rollup groups child rows into an ordered array") {
    val df = Seq(("p1", "b", 2), ("p1", "a", 1), ("p2", "c", 1)).toDF("k", "v", "o")
    val r = Nest.rollup(df, Seq("k"), col("v"), col("o"), "vs")
      .collect().map(x => x.getString(0) -> x.getSeq[String](1)).toMap
    assert(r("p1") == Seq("a", "b") && r("p2") == Seq("c"))
  }

  test("rollupWithParent: parent columns from the first child by order") {
    val df = Seq(("p1", "second", "y", 2), ("p1", "first", "x", 1)).toDF("k", "label", "v", "o")
    val r = Nest.rollupWithParent(df, Seq("k"), Seq("label"), col("v"), col("o"), "vs")
      .collect()(0)
    assert(r.getString(1) == "first" && r.getSeq[String](2) == Seq("x", "y"))
  }
}

class RalawiseSpec extends SparkSpec {
  import graft.suppliers.Ralawise

  private val samplePath = "/root/reference/sample data/Ralawise Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = Ralawise.unified(spark, samplePath); df.cache(); df }

  test("pivots flat SKU rows into products with variant arrays") {
    assume(available)
    val r = unified.filter(col("product_id") === "ralawise_TS009")
      .select(col("name"), col("brand"), size(col("variants")),
        col("material"), col("carton_quantity")).collect()(0)
    assert(r.getString(0) == "Hooded 2-layer softshell jacket")
    assert(r.getString(1) == "2786")
    assert(r.getInt(2) >= 1)
    assert(r.getString(3).contains("Polyester"))
    assert(r.getInt(4) == 10)
  }

  test("variant carries sku, colour, size, price, weight, gtin-null for 'Not available'") {
    assume(available)
    val v = unified.filter(col("product_id") === "ralawise_TS009")
      .select(explode(col("variants")).as("v"))
      .filter(col("v.sku") === "TS009BLACS")
      .select(col("v.color.name"), col("v.size"),
        element_at(col("v.prices"), 1).getField("value"),
        col("v.weight.value"), col("v.gtin")).collect()(0)
    assert(v.getString(0) == "Black" && v.getString(1) == "S")
    assert(v.getDouble(2) == 21.3)
    assert(v.getDouble(3) == 0.19)
    assert(v.isNullAt(4))
  }

  test("pipe-separated categorisation becomes leveled categories") {
    assume(available)
    val cats = unified.filter(col("product_id") === "ralawise_TS009")
      .select(explode(col("categories")).as("c"))
      .select(col("c.name"), col("c.level")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cats("Jackets & Coats") == 1)
    assert(cats("Softshells") == 2)
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("ralawise: raw_data present and parseable") {
    if (available) assertRawData(unified, "ralawise")
  }
}

class HttpSourceSpec extends SparkSpec {

  test("file transport serves JSONC with comments stripped; offline transport refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http")
    val f = dir.resolve("resp.jsonc")
    java.nio.file.Files.writeString(f,
      """{ "price": [ { "sku": "X-1", "price": "1,99" } ] } // captured""")
    val transport = HttpSource.fileTransport(spark,
      Map("https://api.example.com/pricelist" -> f.toString))
    val df = HttpSource.fetchJson(spark,
      HttpSource.HttpRequest("https://api.example.com/pricelist"), transport)
    val r = df.select(explode(col("price")).as("p")).select("p.sku").collect()
    assert(r.length == 1 && r(0).getString(0) == "X-1")
    assert(HttpSource.validate(HttpSource.HttpRequest("https://api.example.com/pricelist"), transport))
    assert(!HttpSource.validate(HttpSource.HttpRequest("https://api.example.com/other"), transport))
    intercept[UnsupportedOperationException] {
      HttpSource.offline(HttpSource.HttpRequest("https://api.example.com/x"))
    }
  }

  test("http transport fetches from a local socket with bearer auth; default stays offline") {
    // Loopback-only JDK HttpServer — no egress.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/gw/pricelist", (ex: com.sun.net.httpserver.HttpExchange) => {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val (code, body) =
          if (!auth.contains("Bearer tok-123")) (401, """{"error":"unauthorized"}""")
          else if (ex.getRequestURI.getQuery != "lang=en")
            (400, """{"error":"missing param"}""")
          else (200, """{"price":[{"sku":"HT-1","price":"2,50"}]}""")
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      server.start()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/gw/pricelist"
      val req = HttpSource.HttpRequest(base, params = Map("lang" -> "en"))

      val df = HttpSource.fetchJson(spark, req,
        HttpSource.forName("http", bearerToken = Some("tok-123")))
      val r = df.select(explode(col("price")).as("p")).select("p.sku").collect()
      assert(r.length == 1 && r(0).getString(0) == "HT-1")

      // Missing/wrong auth → IOException with the status code.
      val e = intercept[java.io.IOException] {
        HttpSource.httpTransport(bearerToken = None)(req)
      }
      assert(e.getMessage.contains("401"))
      // validate() probe maps transport failure to false.
      assert(!HttpSource.validate(req, HttpSource.httpTransport(None)))
      assert(HttpSource.validate(req, HttpSource.httpTransport(Some("tok-123"))))

      // Config selection: default name resolves to the refusing
      // offline transport; unknown names fail loudly.
      intercept[UnsupportedOperationException] { HttpSource.forName("")(req) }
      intercept[IllegalArgumentException] { HttpSource.forName("ftp") }
    } finally server.stop(0)
  }
}
