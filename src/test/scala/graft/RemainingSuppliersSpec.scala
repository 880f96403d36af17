package graft

import org.apache.spark.sql.functions._

class XdSpec extends SparkSpec {
  import graft.suppliers.Xd

  private val samplePath = "/root/reference/sample data/XD Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = Xd.unified(spark, samplePath); df.cache(); df }

  test("model nests items; stock joins on ItemCode; gross weight preferred") {
    assume(available)
    val r = unified.filter(col("product_id") === "xd_V10200")
      .select(col("name"), col("brand"), size(col("variants")),
        element_at(col("variants"), 1).getField("stock").getField("available"),
        element_at(col("variants"), 1).getField("weight").getField("value"),
        element_at(col("variants"), 1).getField("weight").getField("unit"),
        col("carton_quantity")).collect()(0)
    assert(r.getString(0) == "VINGA Cott RCS RPET water bottle")
    assert(r.getString(1) == "Vinga")
    assert(r.getInt(2) == 1)
    assert(r.getInt(3) == 17525)
    assert(r.getDouble(4) == 131.0 && r.getString(5) == "g") // gross over net
    assert(r.getInt(6) == 48)
  }

  test("pivoted Qty1..6 price columns unpivot into bounded tiers") {
    assume(available)
    val tiers = unified.filter(col("product_id") === "xd_V10200")
      .select(explode(element_at(col("variants"), 1).getField("prices")).as("p"))
      .select(col("p.min_quantity"), col("p.max_quantity"), col("p.value"),
        col("p.currency"))
      .orderBy(col("min_quantity")).collect()
    assert(tiers.length == 6)
    assert(tiers(0).getInt(0) == 1 && tiers(0).getInt(1) == 99 &&
      tiers(0).getDouble(2) == 2.82)
    assert(tiers(5).getInt(0) == 1500 && tiers(5).isNullAt(1) &&
      tiers(5).getDouble(2) == 2.50)
    assert(tiers.forall(_.getString(3) == "GBP"))
  }

  test("print data becomes positions with mm sizes and VRP coordinates") {
    assume(available)
    val r = unified.filter(col("product_id") === "xd_V10200")
      .select(explode(col("print_positions")).as("pp"))
      .select(col("pp.name"), col("pp.max_width"), col("pp.max_height"),
        col("pp.unit"), col("pp.techniques"),
        element_at(col("pp.coordinates"), "top_left_x")).collect()(0)
    assert(r.getString(0) == "item front middle")
    assert(r.getDouble(1) == 25.0 && r.getDouble(2) == 70.0 && r.getString(3) == "mm")
    assert(r.getSeq[String](4) == Seq("pad_print"))
    assert(r.getString(5) == "707")
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("xd: raw_data present and parseable") {
    if (available) assertRawData(unified, "xd")
  }
}

class MultiVariantNestingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  /** The reference samples carry a single item per model; these
    * synthetic captures verify the rollup actually nests multiple
    * variants in feed order with per-item joins applied. */
  test("XD: multiple ItemCodes nest under one ModelCode with per-item prices/stock") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xd_multi")
    val capture = dir.resolve("xd.jsonc")
    java.nio.file.Files.writeString(capture,
      """{
        |  "Products": {"Response": [
        |    {"ModelCode": "M1", "ItemCode": "I2", "ItemName": "Bottle", "Brand": "B",
        |     "Color": "red", "HexColor1": "FF0000", "ItemHeightCM": 20.0,
        |     "ItemWeightGrossGr": 100.0, "ProductLifeCycle": "Active",
        |     "MainCategory": "Drinkware", "SubCategory": "Bottles",
        |     "EANCode": "111", "OuterCartonQty": 10},
        |    {"ModelCode": "M1", "ItemCode": "I1", "ItemName": "Bottle", "Brand": "B",
        |     "Color": "blue", "HexColor1": "0000FF", "ItemHeightCM": 20.0,
        |     "ItemWeightGrossGr": 100.0, "ProductLifeCycle": "Active",
        |     "MainCategory": "Drinkware", "SubCategory": "Bottles",
        |     "EANCode": "222", "OuterCartonQty": 10}
        |  ]},
        |  "ProductPrices": {"Response": [
        |    {"ModelCode": "M1", "ItemCode": "I1", "Currency": "EUR",
        |     "Qty1": 1, "Qty2": 50, "ItemPriceNet_Qty1": 3.00, "ItemPriceNet_Qty2": 2.50}
        |  ]},
        |  "PrintData": {"Response": []},
        |  "PrintPrices": {"Response": []},
        |  "Stock": {"Response": [
        |    {"ModelCode": "M1", "ItemCode": "I1", "CurrentStock": 42},
        |    {"ModelCode": "M1", "ItemCode": "I2", "CurrentStock": 7}
        |  ]}
        |}""".stripMargin)
    val u = graft.suppliers.Xd.unified(spark, capture.toString)
      .filter(col("product_id") === "xd_M1")
    val r = u.select(size(col("variants")),
      transform(col("variants"), v => v.getField("sku")),
      transform(col("variants"), v => v.getField("stock").getField("available")),
      element_at(col("variants"), 1).getField("prices"),
      col("colors_available")).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getSeq[String](1) == Seq("I1", "I2")) // feed-order by ItemCode
    assert(r.getSeq[Int](2) == Seq(42, 7))         // per-item stock joined
    val p = r.getSeq[org.apache.spark.sql.Row](3)
    assert(p.length == 2 && p.head.getAs[String]("currency") == "EUR")
    assert(r.getSeq[String](4).toSet == Set("blue", "red"))
  }

  test("Ralawise: a sparse capture (minimal columns) still produces unified rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ral_sparse")
    val capture = dir.resolve("ral.jsonc")
    java.nio.file.Files.writeString(capture,
      """[
        |  {"Sku Code": "K1", "Style Code": "S9", "Style Name": "Tee",
        |   "Colour Name": "Red", "Size Name": "M"},
        |  {"Sku Code": "K2", "Style Code": "S9", "Style Name": "Tee",
        |   "Colour Name": "Blue", "Size Name": "L"}
        |]""".stripMargin)
    val u = graft.suppliers.Ralawise.unified(spark, capture.toString)
      .filter(col("product_id") === "ralawise_S9")
    val r = u.select(col("name"), size(col("variants")),
      transform(col("variants"), v => v.getField("sku")),
      col("colors_available")).collect()(0)
    assert(r.getString(0) == "Tee")
    assert(r.getInt(1) == 2)
    assert(r.getSeq[String](2) == Seq("K1", "K2"))
    assert(r.getSeq[String](3).toSet == Set("Red", "Blue"))
  }

  test("S&S: multiple SKUs nest under one styleID with per-SKU stock") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_multi")
    val capture = dir.resolve("ss.jsonc")
    java.nio.file.Files.writeString(capture,
      """{
        |  "products": {"Response": [
        |    {"sku": "S2", "styleID": 7, "brandName": "G", "styleName": "ST",
        |     "colorName": "White", "colorCode": "00", "sizeName": "L",
        |     "unitWeight": 0.5, "piecePrice": 3.0, "qty": 10, "gtin": "g2",
        |     "caseQty": 72, "countryOfOrigin": "US", "warehouses": []},
        |    {"sku": "S1", "styleID": 7, "brandName": "G", "styleName": "ST",
        |     "colorName": "Black", "colorCode": "01", "sizeName": "M",
        |     "unitWeight": 0.4, "piecePrice": 3.0, "qty": 20, "gtin": "g1",
        |     "caseQty": 72, "countryOfOrigin": "US", "warehouses": []}
        |  ]},
        |  "categories": {"Response": []},
        |  "styles": {"Response": []},
        |  "specs": {"Response": []},
        |  "brands": {"Response": []}
        |}""".stripMargin)
    val u = graft.suppliers.SandS.unified(spark, capture.toString)
      .filter(col("product_id") === "ss_7")
    val r = u.select(size(col("variants")),
      transform(col("variants"), v => v.getField("sku")),
      transform(col("variants"), v => v.getField("stock").getField("available")),
      col("colors_available")).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getSeq[String](1) == Seq("S1", "S2"))
    assert(r.getSeq[Int](2) == Seq(20, 10))
    assert(r.getSeq[String](3).toSet == Set("Black", "White"))
  }
}

class SandSSpec extends SparkSpec {
  import graft.suppliers.SandS

  private val samplePath = "/root/reference/sample data/s&s.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = SandS.unified(spark, samplePath); df.cache(); df }

  test("SKU rows nest by style; piece/dozen/case prices tier by caseQty") {
    assume(available)
    val r = unified.filter(col("product_id") === "ss_39")
      .select(col("brand"), size(col("variants")),
        element_at(col("variants"), 1).getField("sku"),
        element_at(col("variants"), 1).getField("size"),
        element_at(col("variants"), 1).getField("gtin")).collect()(0)
    assert(r.getString(0) == "Gildan")
    assert(r.getInt(1) == 1)
    assert(r.getString(2) == "B00760004")
    assert(r.getString(3) == "M")
    assert(r.getString(4) == "00821780001001")
    val tiers = unified.filter(col("product_id") === "ss_39")
      .select(explode(element_at(col("variants"), 1).getField("prices")).as("p"))
      .select(col("p.min_quantity"), col("p.description"), col("p.value"))
      .orderBy(col("min_quantity"), col("p.description")).collect()
    // piece(1-11), sale(1-), dozen(12-71), case(72-)
    assert(tiers.map(_.getString(1)).toSet == Set("piece", "dozen", "case", "sale"))
    assert(tiers.filter(_.getString(1) == "case").head.getInt(0) == 72)
  }

  test("warehouse rows become due-ins; qty totals available stock") {
    assume(available)
    val r = unified.filter(col("product_id") === "ss_39")
      .select(
        element_at(col("variants"), 1).getField("stock").getField("available"),
        size(element_at(col("variants"), 1).getField("stock").getField("due_ins")))
      .collect()(0)
    assert(r.getInt(0) == 7500)
    assert(r.getInt(1) >= 1)
  }

  test("warehouse rows also snapshot into stock.locations") {
    assume(available)
    // One warehouse (KS, qty 500); warehouseAbbr doubles as id and
    // name, and the feed carries no per-warehouse country.
    val loc = unified.filter(col("product_id") === "ss_39")
      .select(explode(element_at(col("variants"), 1)
        .getField("stock").getField("locations")).as("l"))
      .select(col("l.id"), col("l.name"), col("l.country"), col("l.qty"))
      .collect()
    assert(loc.length == 1)
    assert(loc(0).getString(0) == "KS" && loc(0).getString(1) == "KS")
    assert(loc(0).isNullAt(2))
    assert(loc(0).getInt(3) == 500)
  }

  test("style dimension misses resolve to null-safe defaults") {
    assume(available)
    // styleID 39 has no styles-dim row: name falls back to styleName.
    val r = unified.filter(col("product_id") === "ss_39")
      .select(col("name"), col("title"), col("long_description")).collect()(0)
    assert(r.getString(0) == "2000")
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("HTML strips from style descriptions") {
    val df = strDf("d", Seq("<ul><li>100% cotton</li><li>Pre-curved&nbsp;visor</li></ul>"))
    val out = df.select(SandS.stripHtml(col("d"))).collect()(0).getString(0)
    assert(out == "100% cotton Pre-curved visor")
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("ss_activewear: raw_data present and parseable") {
    if (available) assertRawData(unified, "ss_activewear")
  }
}

class PfConceptSpec extends SparkSpec {
  import graft.suppliers.PfConcept

  private val samplePath = "/root/reference/sample data/PFConcept Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = PfConcept.unified(spark, samplePath); df.cache(); df }

  test("model parses with comma-decimal weights and keyword split") {
    assume(available)
    val r = unified.filter(col("product_id") === "pfconcept_R1070")
      .select(col("name"), col("brand"), col("weight.value"), col("weight.unit"),
        col("keywords"), col("country_of_origin"), col("material")).collect()(0)
    assert(r.getString(0) == "Clasica unisex crewneck sweater")
    assert(r.getString(1) == "Roly")
    assert(r.getDouble(2) == 12.0 && r.getString(3) == "kg") // gross "12" over nett "11,4"
    assert(r.getSeq[String](4).contains("hoodie"))
    assert(r.getString(5) == "Bangladesh")
    assert(r.getString(6).startsWith("Knit of 50% Cotton"))
  }

  test("price scales tier with next-bar bounds") {
    assume(available)
    val tiers = unified.filter(col("product_id") === "pfconcept_R1070")
      .select(explode(element_at(col("variants"), 1).getField("prices")).as("p"))
      .select(col("p.min_quantity"), col("p.max_quantity"), col("p.value"))
      .orderBy(col("min_quantity")).collect()
    assert(tiers.length == 4)
    assert(tiers(0).getInt(0) == 1 && tiers(0).getInt(1) == 99)
    assert(tiers(3).getInt(0) == 1000 && tiers(3).isNullAt(1))
    assert(tiers.forall(_.getDouble(2) == 6.37))
  }

  test("default decoration becomes the default print option") {
    assume(available)
    val opts = unified.filter(col("product_id") === "pfconcept_R1070")
      .select(explode(col("print_options")).as("o"))
      .select(col("o.technique"), col("o.position"), col("o.is_default"),
        col("o.max_colors")).collect()
    assert(opts.exists(o => o.getString(0) == "screen_print" &&
      o.getString(1) == "left chest" && o.getBoolean(2) && o.getInt(3) == 5))
  }

  test("stock carries next-PO due-in with date") {
    assume(available)
    val r = unified.filter(col("product_id") === "pfconcept_R1070")
      .select(
        element_at(col("variants"), 1).getField("stock").getField("available"),
        element_at(element_at(col("variants"), 1).getField("stock")
          .getField("due_ins"), 1).getField("quantity"),
        element_at(element_at(col("variants"), 1).getField("stock")
          .getField("due_ins"), 1).getField("expected_date")).collect()(0)
    assert(r.getInt(0) == 63)
    assert(r.getInt(1) == 875)
    assert(r.getString(2) == "2025-06-17")
  }

  test("relatedItems union across items into sorted-distinct related_products") {
    assume(available)
    val r = unified.filter(col("product_id") === "pfconcept_R1070")
      .select(col("related_products"), col("alternative_products")).collect()(0)
    assert(r.getSeq[String](0) ==
      Seq("37512", "37513", "38210", "38231", "38232", "K1070", "R1071"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("deco-charge grid flattens to printCode-keyed tier dimension") {
    assume(available)
    val dim = PfConcept.decoChargeDim(PfConcept.readFeed(spark, samplePath))
    val r = dim.filter(col("__print_code") === "D3D01")
      .select(col("__option.technique"), col("__option.setup_charge"),
        size(col("__option.prices"))).collect()(0)
    assert(r.getString(0) == "digital_print")
    assert(r.getDouble(1) == 32.0)
    assert(r.getInt(2) == 10)
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("pfconcept: raw_data present and parseable") {
    if (available) assertRawData(unified, "pfconcept")
  }
}

class SanmarSpec extends SparkSpec {
  import graft.suppliers.Sanmar

  private val samplePath = "/root/reference/sample data/Sanmar Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = Sanmar.unified(spark, samplePath); df.cache(); df }

  test("PromoStandards product parses with keywords, categories, descriptions") {
    assume(available)
    val r = unified.filter(col("product_id") === "sanmar_108085")
      .select(col("name"), col("brand"), col("short_description"),
        col("keywords"), size(col("categories"))).collect()(0)
    assert(r.getString(0).startsWith("OGIO - Crunch Duffel"))
    assert(r.getString(1) == "OGIO")
    assert(r.getString(2).startsWith("This go-to travel"))
    assert(r.getSeq[String](3).contains("embroidery"))
    assert(r.getInt(4) == 2) // Bags + Duffels
  }

  test("singleton part normalizes to one variant with media images and price") {
    assume(available)
    val r = unified.filter(col("product_id") === "sanmar_108085")
      .select(size(col("variants")),
        element_at(col("variants"), 1).getField("sku"),
        element_at(col("variants"), 1).getField("color").getField("name"),
        element_at(col("variants"), 1).getField("color").getField("pms_color"),
        size(element_at(col("variants"), 1).getField("images")),
        element_at(element_at(col("variants"), 1).getField("prices"), 1)
          .getField("value"),
        element_at(col("variants"), 1).getField("gtin")).collect()(0)
    assert(r.getInt(0) == 1)
    assert(r.getString(1) == "478783")
    assert(r.getString(2) == "Wasabe")
    assert(r.getString(3) == "7742C")
    assert(r.getInt(4) == 5)
    assert(r.getDouble(5) == 46.58)
    assert(r.getString(6) == "00191265684859")
  }

  test("feet/ounce dimensions normalize to inches/ounces") {
    assume(available)
    val r = unified.filter(col("product_id") === "sanmar_108085")
      .select(element_at(col("variants"), 1).getField("weight").getField("value"),
        element_at(col("variants"), 1).getField("weight").getField("unit"),
        element_at(col("variants"), 1).getField("dimensions")).collect()(0)
    assert(r.getDouble(0) == 37.92 && r.getString(1) == "oz")
    assert(r.isNullAt(2)) // 0×0×0 collapses to null (P9 semantics)
  }

  test("inventory parts carry per-warehouse location snapshots") {
    assume(available)
    // The sample's inventory part (62822) has 9 US locations; their
    // quantities sum to the part's quantityAvailable (349).
    val r = Sanmar.stockByPart(Sanmar.readFeed(spark, samplePath))
      .filter(col("__stock_part") === "62822")
      .select(col("__stock.available"),
        size(col("__stock.locations")),
        aggregate(col("__stock.locations"), lit(0),
          (acc, l) => acc + l.getField("qty")),
        element_at(col("__stock.locations"), 1).getField("name"),
        element_at(col("__stock.locations"), 1).getField("country"),
        element_at(col("__stock.locations"), 2).getField("qty")).collect()(0)
    assert(r.getInt(0) == 349)
    assert(r.getInt(1) == 9)
    assert(r.getInt(2) == 349) // locations are a partition of available
    assert(r.getString(3) == "Seattle" && r.getString(4) == "US")
    assert(r.getInt(5) == 96) // Cincinnati
  }

  test("PromoStandards relations split into related vs alternative products") {
    assume(available)
    // The sample declares one "Companion Sell" relation and no
    // "Substitute" ones.
    val r = unified.filter(col("product_id") === "sanmar_108085")
      .select(col("related_products"), col("alternative_products")).collect()(0)
    assert(r.getSeq[String](0) == Seq("108085"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("sanmar: raw_data present and parseable") {
    if (available) assertRawData(unified, "sanmar")
  }
}
