package graft

import graft.sources.FeedReader

class FeedReaderSpec extends SparkSpec {

  test("malformed feed raises a clear error, not an unresolved-column failure") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badfeed")
    val bad = dir.resolve("bad.jsonc")
    java.nio.file.Files.writeString(bad, "{ definitely not json }")
    val e = intercept[IllegalArgumentException](
      FeedReader.readSection(spark, bad.toString, "products.Response"))
    assert(e.getMessage.contains("not valid JSON"))
  }

  test("unified rows load into the typed Dataset[Product] boundary") {
    val samplePath = "/root/reference/sample data/Laltex Sample Data.jsonc"
    assume(new java.io.File(samplePath).exists())
    import graft.schema.Product
    val spark0 = spark
    import spark0.implicits._
    val products: Seq[Product] = graft.suppliers.Laltex.unified(spark, samplePath)
      .to(graft.schema.Unified.schema).as[Product].collect().toSeq
    assert(products.nonEmpty)
    assert(products.forall(_.supplier.id == "laltex"))
    assert(products.exists(_.variants.nonEmpty))
  }

  test("directory of captures parses one document per file, sections union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_feeds")
    java.nio.file.Files.writeString(dir.resolve("a.jsonc"),
      """{
        |  "products": { // capture 1
        |    "Response": [{"id": 1}, {"id": 2},]
        |  }
        |}""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("b.jsonc"),
      """{"products": {"Response": [{"id": 3}]}}""")
    val rows = FeedReader.readSection(spark, dir.toString, "products.Response")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L, 3L))
  }

  test("stripComments is string-aware: '//' inside URLs survives") {
    assert(FeedReader.stripComments("""  "url": "https://cdn.example.com/x.jpg", // comment""")
      == """  "url": "https://cdn.example.com/x.jpg", """)
    assert(FeedReader.stripComments("""// whole line""") == "")
    assert(FeedReader.stripComments("""  "a": 1,""") == """  "a": 1,""")
    assert(FeedReader.stripComments("""  "esc": "a\"b//c", // tail""")
      == """  "esc": "a\"b//c", """)
  }

  test("readSection explodes arrays and unwraps structs from a JSONC doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft-feed")
    val f = dir.resolve("feed.jsonc")
    java.nio.file.Files.writeString(f,
      """{
        |  "products": { // the product endpoint
        |    "GET": "https://api.example.com/products", //?? capture noise
        |    "Response": [
        |      { "code": "A1", "site": "https://x.example.com//a" },
        |      { "code": "B2", "site": "https://x.example.com//b" }
        |    ]
        |  },
        |  "meta": { "Response": { "currency": "GBP" } }
        |}""".stripMargin)
    val products = FeedReader.readSection(spark, f.toString, "products.Response")
    assert(products.count() == 2)
    assert(products.select("code").collect().map(_.getString(0)).sorted.toSeq == Seq("A1", "B2"))
    // '//' inside the string survived the comment strip
    assert(products.filter(products("site").contains("//a")).count() == 1)
    val meta = FeedReader.readSection(spark, f.toString, "meta.Response")
    assert(meta.select("currency").collect()(0).getString(0) == "GBP")
  }

  test("missing file validates false and reads as empty doc") {
    assert(!FeedReader.validate(spark, "/nonexistent/nope.jsonc"))
  }
}

/** Golden integration test against the real reference capture (read-only).
  * Skipped gracefully if the reference tree is absent. */
class MidOceanSpec extends SparkSpec {
  import graft.suppliers.MidOcean

  private val samplePath = "/root/reference/sample data/MidOcean Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = {
    val df = MidOcean.unified(spark, samplePath)
    df.cache(); df
  }

  test("extracts all master products from the capture (BASELINE: 5 products)") {
    assume(available)
    assert(unified.count() == 5)
    val ids = unified.select("product_id").collect().map(_.getString(0)).toSet
    assert(ids.contains("midocean_AR1249"))
    assert(ids.forall(_.startsWith("midocean_")))
  }

  test("J1: variant prices joined from pricelist by sku (7 priced SKUs)") {
    assume(available)
    import org.apache.spark.sql.functions._
    val priced = unified
      .select(explode(col("variants")).as("v"))
      .select(col("v.sku").as("sku"), col("v.prices").as("prices"))
      .filter(size(col("prices")) > 0)
    val bySkuCount = priced.count()
    assert(bySkuCount == 7, s"expected 7 priced SKUs, got $bySkuCount")
    // AR1249-16 -> "3,63" -> 3.63 GBP tier-1 unit price
    val p = priced.filter(col("sku") === "AR1249-16")
      .select(element_at(col("prices"), 1).getField("value"),
        element_at(col("prices"), 1).getField("currency"),
        element_at(col("prices"), 1).getField("min_quantity")).collect()(0)
    assert(p.getDouble(0) == 3.63 && p.getString(1) == "GBP" && p.getInt(2) == 1)
  }

  test("unified row shape: supplier, dims with comma decimals, weight preference, carton") {
    assume(available)
    import org.apache.spark.sql.functions._
    val r = unified.filter(col("product_id") === "midocean_AR1249")
      .select(col("supplier.id"), col("supplier_product_code"), col("name"),
        col("dimensions.length"), col("dimensions.unit"),
        col("weight.value"), col("weight.unit"),
        col("carton_quantity"), col("is_printable"), col("material"),
        col("tariff_code"), col("status")).collect()(0)
    assert(r.getString(0) == "midocean")
    assert(r.getString(1) == "AR1249")
    assert(r.getString(2) == "TARGET")
    assert(r.getDouble(3) == 10.5)              // "10.5" parsed
    assert(r.getString(4) == "cm")
    assert(r.getDouble(5) == 0.138)             // gross preferred over net 0.111
    assert(r.getString(6) == "kg")
    assert(r.getInt(7) == 80)                   // outer_carton_quantity
    assert(r.getBoolean(8))                     // printable: "yes"
    assert(r.getString(9) == "Stainless Steel")
    assert(r.getString(10) == "9014 1000")      // commodity_code -> tariff_code
    assert(r.getString(11) == "active")
  }

  test("A5 order-sensitivity: categories/base_prices/images come from first variant") {
    assume(available)
    import org.apache.spark.sql.functions._
    val r = unified.filter(col("product_id") === "midocean_AR1249")
      .select(col("categories"), col("base_prices"), size(col("images"))).collect()(0)
    val cats = r.getSeq[org.apache.spark.sql.Row](0).map(c => (c.getString(1), c.getInt(2)))
    assert(cats.head == ("Sport & receation accessories", 1))
    assert(cats.contains(("Office & Writing", 1)))
    val basePrices = r.getSeq[org.apache.spark.sql.Row](1)
    assert(basePrices.length == 1 && basePrices.head.getDouble(0) == 3.63)
    assert(r.getInt(2) == 6) // first variant's six images
  }

  test("J2: print positions joined by master_code with technique mapping") {
    assume(available)
    import org.apache.spark.sql.functions._
    val pos = unified.filter(col("product_id") === "midocean_AR1249")
      .select(explode(col("print_positions")).as("p"))
      .select(col("p.id"), col("p.unit"), col("p.techniques"), col("p.max_width"))
    val byId = pos.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getSeq[String](2), r.getDouble(3))).toMap
    assert(byId.contains("TOP COMPASS"))
    val (unit, techniques, w) = byId("TOP COMPASS")
    assert(unit == "mm" && w == 25.0)
    assert(techniques == Seq("laser_engraving")) // L3 mapped, unknown codes dropped
  }

  test("J3/F14: global print options with parsed tier prices attach to every product") {
    assume(available)
    import org.apache.spark.sql.functions._
    val counts = unified.select(size(col("print_options")).as("n"))
      .collect().map(_.getInt(0)).toSet
    assert(counts.size == 1 && counts.head > 0, s"same option set everywhere, got $counts")
    val embossing = unified.limit(1)
      .select(explode(col("print_options")).as("o")).filter(col("o.technique") === "debossing")
      .select(col("o.setup_charge"), col("o.prices")).collect()(0)
    assert(embossing.getDouble(0) == 45.0) // "45,00"
    val prices = embossing.getSeq[org.apache.spark.sql.Row](1)
    // scales: tier "1.000" parses as min_quantity 1000 (thousands separator)
    assert(prices.exists(p => p.getInt(2) == 1000 && p.getDouble(0) == 0.59))
    assert(prices.exists(p => p.getInt(2) == 1 && p.getDouble(0) == 2.33))
  }

  test("P7: variant status via sentinel/PLC rules over the real feed") {
    assume(available)
    import org.apache.spark.sql.functions._
    val statuses = unified.select(explode(col("variants")).as("v"))
      .select(col("v.status")).distinct().collect().map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("active", "discontinued")))
  }

  test("raw_data preserves the original document as JSON") {
    assume(available)
    import org.apache.spark.sql.functions._
    val raw = unified.filter(col("product_id") === "midocean_AR1249")
      .select(col("raw_data")).collect()(0).getString(0)
    assert(raw.contains("\"master_code\":\"AR1249\""))
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    // Same tree modulo nullability (Spark keeps provably-non-null tighter;
    // catalogString drops NOT NULL markers).
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() == 5)
  }

  test("midocean: raw_data present and parseable") {
    if (available) assertRawData(unified, "midocean")
  }
}
