package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FeedReader

/** XD / Xindao supplier pipeline: five correlated feeds → unified rows.
  *
  * Feed shapes (ref: sample data/XD Sample Data.jsonc:3 Products,
  * :89 ProductPrices, :125 PrintData, :152 PrintPrices, :469 Stock):
  * one flat row per ItemCode (colour variant), grouped into a product
  * by ModelCode; item price tiers arrive PIVOTED as `Qty1..Qty6` ×
  * `ItemPriceNet_Qty1..6` column pairs and print price tiers as
  * `PrintPriceNet_<q>` at fixed breakpoints — both are unpivoted into
  * the unified tier-array form (SURVEY J5 semantics, A.6 fixture
  * notes). Stock is the J4 equi-join on ItemCode.
  *
  * Scale: Products/Prices/Stock all key on ItemCode with ~equal
  * cardinality → plain shuffled equi-joins (not broadcast — at 100 TB
  * none of them is a small side; AQE may still downgrade to broadcast
  * at test SF). PrintPrices is a genuine technique dimension →
  * broadcast. One hash-aggregate per ModelCode does the nesting; the
  * unpivot itself is a map-side array construction, no explode needed.
  */
object Xd {

  val supplierId = "xd"

  /** PrintTechnique label → canonical enum (graft.schema.Enums).
    * Unknown labels are kept lowercased/underscored rather than
    * dropped — XD's labels are open-ended. */
  val techniqueMap: Map[String, String] = Map(
    "pad print" -> "pad_print",
    "co2 engraving" -> "laser_engraving",
    "laser engraving" -> "laser_engraving",
    "silkscreen" -> "screen_print",
    "screen print" -> "screen_print",
    "screen round" -> "screen_print",
    "digital" -> "digital_print",
    "digital print" -> "digital_print",
    "doming" -> "full_color",
    "embroidery" -> "embroidery",
    "sublimation" -> "sublimation",
    "transfer" -> "transfer")

  private val techniqueMapCol: Column =
    map(techniqueMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private def canonTechnique(label: Column): Column =
    coalesce(
      element_at(techniqueMapCol, lower(coalesce(label, lit("")))),
      regexp_replace(lower(coalesce(label, lit(""))), "[^a-z0-9]+", "_"))

  case class Feed(doc: DataFrame) {
    def products: DataFrame = FeedReader.sectionOf(doc, "Products.Response")
    def prices: DataFrame = FeedReader.sectionOf(doc, "ProductPrices.Response")
    def printData: DataFrame = FeedReader.sectionOf(doc, "PrintData.Response")
    def printPrices: DataFrame = FeedReader.sectionOf(doc, "PrintPrices.Response")
    def stock: DataFrame = FeedReader.sectionOf(doc, "Stock.Response")
  }

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(FeedReader.requiredFor(
      "Products.Response" -> productCols,
      "ProductPrices.Response" -> priceCols,
      "PrintData.Response" -> printDataCols,
      "PrintPrices.Response" -> printPriceCols,
      "Stock.Response" -> stockCols))))

  private val priceType = graft.schema.Unified.schema("base_prices").dataType

  /** Unpivot the Qty1..Qty6 / ItemPriceNet_Qty1..6 column pairs into a
    * tier array; max_quantity of tier i is Qty(i+1)-1 (open-ended last
    * tier). Map-side only; the input must be conformed (see
    * [[FeedReader.conform]]) so every tier column resolves. */
  private def itemTiers(currency: Column): Column = {
    val entries = (1 to 6).map { i =>
      val nextQty =
        if (i < 6) col(s"Qty${i + 1}").try_cast("int") - 1
        else lit(null).cast("int")
      struct(
        col(s"ItemPriceNet_Qty$i").try_cast("double").as("value"),
        coalesce(currency, lit("GBP")).as("currency"),
        coalesce(col(s"Qty$i").try_cast("int"), lit(1)).as("min_quantity"),
        nextQty.as("max_quantity"),
        lit("unit").as("type"),
        lit(null).cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until"))
    }
    filter(array(entries: _*), t => t.getField("value").isNotNull)
  }

  /** Print tiers arrive at fixed breakpoints as PrintPriceNet_<q>. */
  private val printBreaks = Seq(1, 50, 100, 250, 500, 1000, 2500, 5000, 10000)

  private def printTiers(currency: Column): Column = {
    val entries = printBreaks.zipWithIndex.map { case (q, i) =>
      val maxQ =
        if (i < printBreaks.size - 1) lit(printBreaks(i + 1) - 1).cast("int")
        else lit(null).cast("int")
      struct(
        col(s"PrintPriceNet_$q").try_cast("double").as("value"),
        coalesce(currency, lit("GBP")).as("currency"),
        lit(q).as("min_quantity"),
        maxQ.as("max_quantity"),
        lit("unit").as("type"),
        lit(null).cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until"))
    }
    filter(array(entries: _*), t => t.getField("value").isNotNull)
  }

  /** Column contracts per feed section (FeedReader.conform): a sparse
    * or empty capture still resolves every referenced column. */
  private val productCols: Seq[(String, String)] =
    Seq("ModelCode", "ItemCode", "ItemName", "Brand", "MainCategory",
      "SubCategory", "Material", "Color", "PMSColor1", "HexColor1",
      "CountryOfOrigin", "CommodityCode", "EANCode", "PackagingTypeItem",
      "ProductLifeCycle", "LongDescription").map(_ -> "string") ++
      Seq("ItemLengthCM", "ItemWidthCM", "ItemHeightCM", "ItemDiameterCM",
        "ItemWeightNetGr", "ItemWeightGrossGr").map(_ -> "double") ++
      Seq("OuterCartonQty" -> "int") ++
      // unified.jsonc packaging/sustainability/lifecycle sources.
      Seq("IntroDate", "Compliance", "Certifications", "Social Audits",
        "MainImage", "AllImages", "RestrictedCountriesForSale")
        .map(_ -> "string") ++
      Seq("Eco" -> "boolean", "InnerboxQty" -> "int",
        "GiftWrappingPossible" -> "boolean",
        "VariableDataPrinting" -> "boolean") ++
      Seq("Recycled Content Percent", "Total CO2 emissions",
        "Total CO2 emissions benchmark", "OuterCartonLengthCM",
        "OuterCartonWidthCM", "OuterCartonHeightCM",
        "OuterCartonWeightNetKG", "OuterCartonWeightGrossKG")
        .map(_ -> "double")
  private val priceCols: Seq[(String, String)] =
    Seq("ItemCode" -> "string", "Currency" -> "string") ++
      (1 to 6).flatMap(i => Seq(s"Qty$i" -> "int", s"ItemPriceNet_Qty$i" -> "double"))
  private val stockCols: Seq[(String, String)] =
    Seq("ItemCode" -> "string", "CurrentStock" -> "int")
  private val printDataCols: Seq[(String, String)] =
    Seq("ModelCode", "ItemCode", "PrintCode", "PrintTechnique",
      "PrintPosition", "PrintPositionCode", "VRP_URL", "LineDrawing")
      .map(_ -> "string") ++
      Seq("MaxPrintWidthMM" -> "double", "MaxPrintHeightMM" -> "double",
        "MaxColors" -> "int", "Default" -> "boolean",
        "VRP_X" -> "long", "VRP_Y" -> "long",
        "VRP_Width" -> "long", "VRP_Height" -> "long")
  private val printPriceCols: Seq[(String, String)] =
    Seq("PrintCode" -> "string", "Currency" -> "string", "SetupNet" -> "double") ++
      printBreaks.map(q => s"PrintPriceNet_$q" -> "double")

  def unified(feed: Feed): DataFrame = unified(feed, "en")

  /** `language` is the language of the per-language feed this capture
    * came from (XD publishes one feed per language — the `-en-gb`
    * suffix in the feed URL, XD Sample Data.jsonc:3); it keys this
    * run's localized maps. Merge runs with
    * [[graft.operators.Localize.mergeLanguageRuns]]. */
  def unified(feed: Feed, language: String): DataFrame = {
    val items = FeedReader.conform(feed.products, productCols)
    def opt(name: String): Column = col(name)

    // J5 data, pivoted form → tier array keyed by ItemCode.
    val pricesC = FeedReader.conform(feed.prices, priceCols)
    val tiers = pricesC.select(
      col("ItemCode").as("__price_item"),
      itemTiers(col("Currency")).as("__tier_prices"))

    // J4: stock by ItemCode.
    val stock = FeedReader.conform(feed.stock, stockCols).select(
      col("ItemCode").as("__stock_item"),
      struct(
        coalesce(col("CurrentStock").try_cast("int"), lit(0)).as("available"),
        array().cast(graft.schema.Unified.stockSchema("due_ins").dataType)
          .as("due_ins"),
        array().cast(graft.schema.Unified.stockLocationsType).as("locations"),
        lit(null).cast("timestamp").as("last_updated")).as("__stock"))

    // PrintPrices: small technique dimension keyed by PrintCode → broadcast.
    val printPriceDim = broadcast(
      FeedReader.conform(feed.printPrices, printPriceCols).select(
        col("PrintCode").as("__pp_code"),
        col("SetupNet").try_cast("double").as("__pp_setup"),
        printTiers(col("Currency")).as("__pp_tiers")))

    // Print options + positions per model: PrintData ⋈ PrintPrices.
    val printByModel = FeedReader.conform(feed.printData, printDataCols)
      .join(printPriceDim, col("PrintCode") === col("__pp_code"), "left_outer")
      .groupBy(col("ModelCode"))
      .agg(
        transform(
          graft.operators.Nest.sortByKey(collect_list(struct(
            struct(col("PrintCode"), col("PrintPosition")).as("o"),
            struct(
              canonTechnique(col("PrintTechnique")).as("technique"),
              coalesce(col("PrintPosition"), lit("")).as("position"),
              coalesce(col("MaxColors").try_cast("int"), lit(1)).as("max_colors"),
              col("__pp_setup").as("setup_charge"),
              coalesce(col("__pp_tiers"), array().cast(priceType)).as("prices"),
              lit(null).cast("string").as("lead_time"),
              coalesce(col("Default").try_cast("boolean"), lit(false)).as("is_default"),
              lit(null).cast("map<string,string>").as("technique_names"))
              .as("v")))),
          x => x.getField("v")).as("__print_options"),
        transform(
          graft.operators.Nest.sortByKey(collect_list(struct(
            struct(col("PrintPositionCode"), col("PrintCode")).as("o"),
            struct(
              coalesce(col("PrintPositionCode"), col("PrintPosition"), lit("")).as("id"),
              coalesce(col("PrintPosition"), lit("")).as("name"),
              col("MaxPrintWidthMM").try_cast("double").as("max_width"),
              col("MaxPrintHeightMM").try_cast("double").as("max_height"),
              lit(null).cast("double").as("max_area"),
              lit("mm").as("unit"),
              array(canonTechnique(col("PrintTechnique"))).as("techniques"),
              col("MaxColors").try_cast("int").as("max_colors"),
              map(
                lit("top_left_x"), col("VRP_X").cast("string"),
                lit("top_left_y"), col("VRP_Y").cast("string"),
                lit("width"), col("VRP_Width").cast("string"),
                lit("height"), col("VRP_Height").cast("string")).as("coordinates"),
              filter(array(
                struct(col("VRP_URL").as("url"), lit("vrp").as("type"),
                  lit(null).cast("string").as("description"),
                  lit(null).cast("string").as("color_variant")),
                struct(col("LineDrawing").as("url"), lit("line_drawing").as("type"),
                  lit(null).cast("string").as("description"),
                  lit(null).cast("string").as("color_variant"))),
                i => i.getField("url").isNotNull).as("images"))
              .as("v")))),
          x => x.getField("v")).as("__print_positions"))

    val joined = items
      .join(tiers, col("ItemCode") === col("__price_item"), "left_outer")
      .join(stock, col("ItemCode") === col("__stock_item"), "left_outer")

    val status = when(
      upper(coalesce(col("ProductLifeCycle"), lit(""))).contains("DISCONTINU"),
      "discontinued").otherwise("active")

    val dims = when(
      coalesce(opt("ItemLengthCM"), opt("ItemWidthCM"),
        opt("ItemHeightCM"), opt("ItemDiameterCM")).isNotNull,
      struct(
        opt("ItemLengthCM").try_cast("double").as("length"),
        opt("ItemWidthCM").try_cast("double").as("width"),
        opt("ItemHeightCM").try_cast("double").as("height"),
        opt("ItemDiameterCM").try_cast("double").as("diameter"),
        lit("cm").as("unit")))

    // F10: gross weight preferred over net; grams.
    val weight = {
      val w = coalesce(col("ItemWeightGrossGr").try_cast("double"),
        col("ItemWeightNetGr").try_cast("double"))
      when(w.isNotNull, struct(w.as("value"), lit("g").as("unit")))
    }

    val variantStruct = struct(
      coalesce(col("ItemCode"), lit("")).as("sku"),
      col("ItemCode").as("variant_id"),
      when(col("Color").isNotNull, struct(
        coalesce(col("Color"), lit("")).as("code"),
        coalesce(col("Color"), lit("")).as("name"),
        nullif(col("HexColor1"), lit("")).as("hex_color"),
        nullif(col("PMSColor1"), lit("")).as("pms_color"),
        array().cast(graft.schema.Unified.schema("images").dataType).as("images"),
        lit("active").as("status"))).as("color"),
      lit(null).cast("string").as("size"),
      nullif(col("Material"), lit("")).as("material_variant"),
      dims.as("dimensions"),
      weight.as("weight"),
      coalesce(col("__tier_prices"), array().cast(priceType)).as("prices"),
      col("__stock").as("stock"),
      array().cast(graft.schema.Unified.schema("images").dataType).as("images"),
      status.as("status"),
      nullif(col("EANCode"), lit("")).as("gtin"))

    val parentCols = Seq("ItemName", "Brand", "MainCategory", "SubCategory",
      "Material", "LongDescription", "CountryOfOrigin", "CommodityCode",
      "OuterCartonQty", "PackagingTypeItem",
      "ProductLifeCycle", "IntroDate", "Compliance", "Certifications",
      "Social Audits", "Eco", "InnerboxQty", "Recycled Content Percent",
      "Total CO2 emissions", "Total CO2 emissions benchmark",
      "OuterCartonLengthCM", "OuterCartonWidthCM", "OuterCartonHeightCM",
      "OuterCartonWeightNetKG", "OuterCartonWeightGrossKG",
      "MainImage", "AllImages", "GiftWrappingPossible",
      "VariableDataPrinting", "RestrictedCountriesForSale")

    val grouped = graft.operators.Nest.rollupWithParent(
      joined, Seq("ModelCode"), parentCols,
      variantStruct.cast(graft.schema.Unified.schema("variants").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType),
      col("ItemCode"), "variants")
      .join(printByModel, Seq("ModelCode"), "left_outer")

    val colorsAvailable = array_distinct(filter(
      transform(col("variants"), v => v.getField("color").getField("name")),
      c => c.isNotNull))

    val categories = filter(array(
      struct(lit(null).cast("string").as("id"), col("MainCategory").as("name"),
        lit(1).as("level"), lit(null).cast("string").as("parent_id")),
      struct(lit(null).cast("string").as("id"), col("SubCategory").as("name"),
        lit(2).as("level"), col("MainCategory").as("parent_id"))),
      c => c.getField("name").isNotNull && c.getField("name") =!= "")

    grouped.select(
      concat(lit("xd_"), coalesce(col("ModelCode"), lit(""))).as("product_id"),
      struct(lit(supplierId).as("id"), lit("XD Connects").as("name"),
        lit(null).cast("string").as("api_version"),
        lit(null).cast("map<string,string>").as("contact_info")).as("supplier"),
      coalesce(col("ModelCode"), lit("")).as("supplier_product_code"),
      coalesce(col("ItemName"), lit("")).as("name"),
      lit(null).cast("string").as("title"),
      lit(null).cast("string").as("short_description"),
      col("LongDescription").as("long_description"),
      array().cast("array<string>").as("keywords"),
      categories.cast(graft.schema.Unified.schema("categories").dataType).as("categories"),
      nullif(col("Brand"), lit("")).as("brand"),
      try_element_at(col("variants"), lit(1)).getField("dimensions").as("dimensions"),
      try_element_at(col("variants"), lit(1)).getField("weight").as("weight"),
      nullif(col("Material"), lit("")).as("material"),
      colorsAvailable.as("colors_available"),
      col("variants"),
      try_element_at(col("variants"), lit(1)).getField("prices").as("base_prices"),
      (size(coalesce(col("__print_options"),
        array().cast(graft.schema.Unified.schema("print_options").dataType))) > 0)
        .as("is_printable"),
      coalesce(col("__print_positions"),
        array().cast(graft.schema.Unified.schema("print_positions").dataType))
        .cast(graft.schema.Unified.schema("print_positions").dataType)
        .as("print_positions"),
      coalesce(col("__print_options"),
        array().cast(graft.schema.Unified.schema("print_options").dataType))
        .cast(graft.schema.Unified.schema("print_options").dataType)
        .as("print_options"),
      // Feed images: MainImage as the primary plus the AllImages CSV as
      // gallery entries (ref: XD Sample Data.jsonc:67-71 — the spec's
      // "insert as gallery type in images" comment).
      {
        val main = nullif(col("MainImage"), lit(""))
        val gallery = filter(transform(
          split(coalesce(col("AllImages"), lit("")), ",\\s*"), u => trim(u)),
          u => u =!= "" && u =!= coalesce(main, lit("")))
        concat(
          filter(array(struct(main.as("url"), lit("main").as("type"),
            lit(null).cast("string").as("description"),
            lit(null).cast("string").as("color_variant"))),
            i => i.getField("url").isNotNull),
          transform(gallery, u => struct(u.as("url"), lit("gallery").as("type"),
            lit(null).cast("string").as("description"),
            lit(null).cast("string").as("color_variant"))))
          .cast(graft.schema.Unified.schema("images").dataType).as("images")
      },
      array().cast("array<string>").as("artwork_templates"),
      lit(1).as("minimum_order_quantity"),
      col("OuterCartonQty").try_cast("int").as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      nullif(col("CountryOfOrigin"), lit("")).as("country_of_origin"),
      nullif(col("CommodityCode"), lit("")).as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      when(exists(col("variants"), v => v.getField("status") === "active"), "active")
        .otherwise("discontinued").as("status"),
      // Carton packaging (ref unified.jsonc:136-161 — XD Sample
      // Data.jsonc:31-42 outer carton dims/weights in cm/kg).
      struct(
        when(col("InnerboxQty").try_cast("int").isNotNull, struct(
          col("InnerboxQty").try_cast("int").as("qty"),
          lit(null).cast("double").as("length"),
          lit(null).cast("double").as("width"),
          lit(null).cast("double").as("height"),
          lit("cm").as("unit"),
          lit(null).cast("double").as("weight_net"),
          lit(null).cast("double").as("weight_gross"),
          lit("kg").as("weight_unit"),
          lit(null).cast("double").as("volume"),
          lit(null).cast("string").as("volume_unit"))).as("inner_carton"),
        when(coalesce(col("OuterCartonQty").try_cast("int"),
            col("OuterCartonLengthCM").try_cast("double")).isNotNull, struct(
          col("OuterCartonQty").try_cast("int").as("qty"),
          col("OuterCartonLengthCM").try_cast("double").as("length"),
          col("OuterCartonWidthCM").try_cast("double").as("width"),
          col("OuterCartonHeightCM").try_cast("double").as("height"),
          lit("cm").as("unit"),
          col("OuterCartonWeightNetKG").try_cast("double").as("weight_net"),
          col("OuterCartonWeightGrossKG").try_cast("double").as("weight_gross"),
          lit("kg").as("weight_unit"),
          lit(null).cast("double").as("volume"),
          lit(null).cast("string").as("volume_unit"))).as("outer_carton"),
        lit(null).cast("string").as("type"),
        nullif(col("PackagingTypeItem"), lit("")).as("type_item"))
        .cast(graft.schema.Unified.schema("packaging").dataType).as("packaging"),
      // Eco/compliance (ref unified.jsonc:188-231 — XD Sample
      // Data.jsonc:43-66 eco flags, recycled %, CO2, audits, certs).
      struct(
        col("Eco").try_cast("boolean").as("eco"),
        col("`Recycled Content Percent`").try_cast("double")
          .as("recycled_content_pct"),
        col("`Total CO2 emissions`").try_cast("double").as("co2_total"),
        col("`Total CO2 emissions benchmark`").try_cast("double")
          .as("co2_total_benchmark"),
        nullif(col("Compliance"), lit("")).as("compliance"),
        filter(transform(split(coalesce(col("`Social Audits`"), lit("")), ","),
          s => trim(s)), s => s =!= "").as("social_audits"),
        filter(transform(split(coalesce(col("Certifications"), lit("")), ",\\s*"),
          s => trim(s)), s => s =!= "").as("certificates"))
        .cast(graft.schema.Unified.schema("sustainability").dataType)
        .as("sustainability"),
      // Lifecycle (ref unified.jsonc:14-22 — ProductLifeCycle enum +
      // IntroDate).
      struct(
        lit(null).cast("string").as("type_of_product"),
        nullif(col("ProductLifeCycle"), lit("")).as("product_lifecycle"),
        col("IntroDate").try_cast("timestamp").as("intro_date"),
        lit(null).cast("timestamp").as("release_date"),
        lit(null).cast("timestamp").as("modified_date"),
        lit(null).cast("timestamp").as("discontinued_date"))
        .cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      array().cast("array<string>").as("related_products"),
      array().cast("array<string>").as("alternative_products"),
      // Localized content maps (ref unified.jsonc:25-33): the feed is
      // single-language (one URL per language), so each non-null field
      // fills this run's language key.
      {
        val l = (c: Column) => when(c.isNotNull, map(lit(language), c))
        struct(
          l(nullif(col("Brand"), lit(""))).as("brand"),
          l(nullif(col("ItemName"), lit(""))).as("name"),
          lit(null).cast("map<string,string>").as("title"),
          lit(null).cast("map<string,string>").as("short_description"),
          l(nullif(col("LongDescription"), lit(""))).as("long_description"),
          lit(null).cast("map<string,string>").as("web_description"),
          lit(null).cast("map<string,string>").as("keywords"))
          .cast(graft.schema.Unified.schema("localized").dataType).as("localized")
      },
      // Open attributes (ref unified.jsonc:91 giftWrappingPossible;
      // :260-266 variableDataPrinting).
      map_filter(map(
        lit("restrictedCountries"), nullif(col("RestrictedCountriesForSale"), lit("")),
        lit("giftWrappingPossible"), col("GiftWrappingPossible").cast("string"),
        lit("variableDataPrinting"), col("VariableDataPrinting").cast("string")),
        (_, v) => v.isNotNull).as("product_extra_data"),
      lit(null).cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      // Model-level source fields (ref unified_product_schema.py:201).
      to_json(struct((Seq("ModelCode") ++ parentCols).map(col): _*))
        .as("raw_data"))
  }

  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))

  /** Read + transform a capture of the `language` feed variant. */
  def unified(spark: SparkSession, path: String, language: String): DataFrame =
    unified(readFeed(spark, path), language)
}
