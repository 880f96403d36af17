package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Parsers
import graft.sources.FeedReader

/** Laltex supplier pipeline: products + stocks endpoints → unified rows.
  *
  * Laltex is spec-defined (no reference transformer exists): the field
  * mapping comes from the sample capture (ref: sample data/Laltex Sample
  * Data.jsonc:1-64 products, :4589-4650 stocks) and the unified.jsonc
  * per-supplier comments. It exercises what MidOcean doesn't:
  * tier pricing with explicit Min/MaxQuantity and "N/A" open tiers
  * (J5 data), currency-symbol prices (F3), dims/weight strings (F17),
  * keyword splitting (F18), and the per-item stock join (J4).
  *
  * Scale: stocks is a small per-item dimension → broadcast equi-join on
  * ItemCode inside an explode→join→re-nest, order preserved by index.
  */
object Laltex {

  val supplierId = "laltex"

  /** Laltex print-type label → canonical technique; unknown dropped. */
  val printTypeMap: Map[String, String] = Map(
    "Spot Print" -> "screen_print", "Screen Print" -> "screen_print",
    "Transfer" -> "transfer", "Full Colour Transfer" -> "transfer",
    "Embroidery" -> "embroidery", "Digital Print" -> "digital_print",
    "Digital" -> "digital_print", "Full Colour" -> "full_color",
    "Laser Engraved" -> "laser_engraving", "Engraved" -> "laser_engraving",
    "Pad Print" -> "pad_print", "Dye Sublimation" -> "sublimation")

  private val printTypeCol: Column =
    map(printTypeMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  case class Feed(doc: DataFrame) {
    def products: DataFrame = FeedReader.sectionOf(doc, "products.Response")
    def stocks: DataFrame = FeedReader.sectionOf(doc, "stocks.Response")
  }

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(FeedReader.requiredFor(
      "products.Response" -> productCols,
      "stocks.Response" -> stockCols))))

  /** ProductPrice tiers → Price structs: "£0.42" strip (F3),
    * MaxQuantity "N/A" → open tier. */
  private def tierPrices(pp: Column): Column =
    transform(
      // Filter the raw tiers first (an invalid tier row is dropped, as
      // the reference's skip-and-log would) — filtering the built
      // structs instead trips a Spark lambda-alias quirk where struct
      // field names degrade to colN.
      filter(coalesce(pp, array()),
        p => Parsers.parseCurrency(p.getField("Price")).isNotNull &&
          p.getField("MinQuantity").try_cast("int").isNotNull),
      p => struct(
        Parsers.parseCurrency(p.getField("Price")).as("value"),
        lit("GBP").as("currency"),
        p.getField("MinQuantity").try_cast("int").as("min_quantity"),
        p.getField("MaxQuantity").try_cast("int").as("max_quantity"),
        lit("unit").as("type"),
        lit(null).cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until")))

  private def urlImages(urls: Column, imgType: String): Column =
    transform(coalesce(urls, array()), u => struct(
      u.as("url"), lit(imgType).as("type"),
      lit(null).cast("string").as("description"),
      lit(null).cast("string").as("color_variant")))

  /** Column contracts (FeedReader.conform): sparse captures resolve
    * every referenced column/nested field. */
  private val productCols: Seq[(String, String)] =
    Seq("ProductCode", "ProductName", "ProductTitle", "Description",
      "WebDescription", "KeyWords", "Category", "SubCategory", "Material",
      "ProductDims", "UnitWeight", "AvailableColours", "CountryOfOrigin",
      "TariffCode").map(_ -> "string") ++ Seq(
      "MinimumOrderQty" -> "string", "CartonQty" -> "string",
      "CartonDims" -> "string", "CartonGrossWeight" -> "string",
      "ProductPrice" ->
        "array<struct<Price:string,MinQuantity:string,MaxQuantity:string>>",
      "Items" ->
        ("array<struct<ItemCode:string,ItemColour:string,ItemSize:string," +
          "PMS:string,ItemImages:array<string>,PlainImages:array<string>>>"),
      "PrintDetails" ->
        "array<struct<PrintPosition:string,PrintArea:string,PrintType:string>>",
      "ArtworkTemplates" -> "array<struct<Template:string>>")
  private val stockCols: Seq[(String, String)] =
    Seq("ProductCode" -> "string", "FreeStock" -> "string",
      "DueIns" -> "array<struct<DueInQty:string,DueInETA:string>>")

  def unified(feed: Feed): DataFrame = {
    val products = FeedReader.conform(feed.products, productCols)

    // J4: per-item stock dimension, broadcast.
    val stocks = broadcast(FeedReader.conform(feed.stocks, stockCols).select(
      col("ProductCode").as("__stock_code"),
      struct(
        coalesce(col("FreeStock").try_cast("int"), lit(0)).as("available"),
        transform(coalesce(col("DueIns"), array()), d => struct(
          d.getField("DueInQty").try_cast("int").as("quantity"),
          d.getField("DueInETA").cast("string").as("expected_date"))).as("due_ins"),
        array().cast(graft.schema.Unified.stockLocationsType).as("locations"),
        lit(null).cast("timestamp").as("last_updated")).as("__stock")))

    val v = products.select(
      col("ProductCode"), tierPrices(col("ProductPrice")).as("__tier_prices"),
      posexplode_outer(col("Items")).as(Seq("__pos", "item")))
    val joined = v.join(stocks, col("item.ItemCode") === col("__stock_code"), "left_outer")

    val variantStruct = struct(
      coalesce(col("item.ItemCode"), lit("")).as("sku"),
      lit(null).cast("string").as("variant_id"),
      struct(
        coalesce(col("item.ItemColour"), lit("")).as("code"),
        coalesce(col("item.ItemColour"), lit("")).as("name"),
        lit(null).cast("string").as("hex_color"),
        col("item.PMS").as("pms_color"),
        urlImages(col("item.ItemImages"), "item").as("images"),
        lit("active").as("status")).as("color"),
      col("item.ItemSize").as("size"),
      lit(null).cast("string").as("material_variant"),
      {
        val d = Parsers.parseDims(col("item.ItemSize"))
        struct(d.getField("length").as("length"), d.getField("width").as("width"),
          d.getField("height").as("height"), lit(null).cast("double").as("diameter"),
          d.getField("unit").as("unit"))
      }.as("dimensions"),
      lit(null).cast("struct<value:double,unit:string>").as("weight"),
      col("__tier_prices")
        .cast(graft.schema.Unified.schema("base_prices").dataType).as("prices"),
      col("__stock").as("stock"),
      concat(urlImages(col("item.ItemImages"), "item"),
        urlImages(col("item.PlainImages"), "plain")).as("images"),
      lit("active").as("status"),
      lit(null).cast("string").as("gtin"))

    val variantsByProduct = joined
      .groupBy(col("ProductCode"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), variantStruct.as("v")))),
        x => x.getField("v")).as("__variants"))

    val base = products.join(variantsByProduct, Seq("ProductCode"), "left_outer")

    val categories = filter(array(
      struct(lit(null).cast("string").as("id"), col("Category").as("name"),
        lit(1).as("level"), lit(null).cast("string").as("parent_id")),
      struct(lit(null).cast("string").as("id"), col("SubCategory").as("name"),
        lit(2).as("level"), lit(null).cast("string").as("parent_id"))),
      c => c.getField("name").isNotNull && c.getField("name") =!= "")

    val printPositions = transform(coalesce(col("PrintDetails"), array()), p => {
      // "PrintArea": "120x25mm" is WxH.
      val areaPat = "^\\s*([0-9]+(?:[.,][0-9]+)?)\\s*x\\s*([0-9]+(?:[.,][0-9]+)?)\\s*(mm|cm)?\\s*$"
      val areaNorm = regexp_replace(lower(coalesce(p.getField("PrintArea"), lit(""))), ",", ".")
      struct(
        coalesce(p.getField("PrintPosition"), lit("")).as("id"),
        coalesce(p.getField("PrintPosition"), lit("")).as("name"),
        regexp_extract(areaNorm, areaPat, 1).try_cast("double").as("max_width"),
        regexp_extract(areaNorm, areaPat, 2).try_cast("double").as("max_height"),
        lit(null).cast("double").as("max_area"),
        lit("mm").as("unit"),
        filter(array(element_at(printTypeCol, p.getField("PrintType"))),
          t => t.isNotNull).as("techniques"),
        lit(null).cast("int").as("max_colors"),
        lit(null).cast("map<string,string>").as("coordinates"),
        array().cast("array<struct<url:string,type:string,description:string,color_variant:string>>").as("images"))
    })

    val printOptions = transform(
      filter(coalesce(col("PrintDetails"), array()),
        p => element_at(printTypeCol, p.getField("PrintType")).isNotNull),
      p => struct(
        element_at(printTypeCol, p.getField("PrintType")).as("technique"),
        coalesce(p.getField("PrintPosition"), lit("various")).as("position"),
        lit(1).as("max_colors"),
        lit(null).cast("double").as("setup_charge"),
        array().cast("array<struct<value:double,currency:string,min_quantity:int,max_quantity:int,type:string,description:string,valid_until:timestamp>>").as("prices"),
        lit(null).cast("string").as("lead_time"),
        lit(false).as("is_default"),
          lit(null).cast("map<string,string>").as("technique_names")))

    val weight = {
      val w = Parsers.parseWeight(col("UnitWeight"))
      when(w.getField("value").isNull, lit(null)).otherwise(struct(
        w.getField("value").as("value"),
        coalesce(w.getField("unit"), lit("g")).as("unit")))
    }

    base.select(
      concat(lit("laltex_"), coalesce(col("ProductCode"), lit(""))).as("product_id"),
      struct(lit(supplierId).as("id"), lit("Laltex").as("name"),
        lit("v1").as("api_version"),
        map(lit("website"), lit("https://www.laltex.com")).as("contact_info")).as("supplier"),
      coalesce(col("ProductCode"), lit("")).as("supplier_product_code"),
      coalesce(col("ProductName"), lit("")).as("name"),
      col("ProductTitle").as("title"),
      col("Description").as("short_description"),
      col("WebDescription").as("long_description"),
      Parsers.splitKeywords(coalesce(col("KeyWords"), lit(""))).as("keywords"),
      categories.as("categories"),
      lit(null).cast("string").as("brand"),
      when(Parsers.parseDims(col("ProductDims")).getField("length").isNull, lit(null))
        .otherwise(struct(
          Parsers.parseDims(col("ProductDims")).getField("length").as("length"),
          Parsers.parseDims(col("ProductDims")).getField("width").as("width"),
          Parsers.parseDims(col("ProductDims")).getField("height").as("height"),
          lit(null).cast("double").as("diameter"),
          coalesce(Parsers.parseDims(col("ProductDims")).getField("unit"), lit("mm")).as("unit")))
        .as("dimensions"),
      weight.as("weight"),
      col("Material").as("material"),
      Parsers.splitKeywords(coalesce(col("AvailableColours"), lit(""))).as("colors_available"),
      // Cast before coalesce: lambda-built struct aliases degrade to
      // colN through collect_list/getField paths, and coalesce insists
      // on identical types.
      coalesce(col("__variants").cast(graft.schema.Unified.schema("variants").dataType),
        array().cast(graft.schema.Unified.schema("variants").dataType)).as("variants"),
      tierPrices(col("ProductPrice"))
        .cast(graft.schema.Unified.schema("base_prices").dataType).as("base_prices"),
      (size(coalesce(col("PrintDetails"), array())) > 0).as("is_printable"),
      printPositions.cast(graft.schema.Unified.schema("print_positions").dataType)
        .as("print_positions"),
      printOptions.cast(graft.schema.Unified.schema("print_options").dataType)
        .as("print_options"),
      array().cast(graft.schema.Unified.schema("images").dataType).as("images"),
      transform(coalesce(col("ArtworkTemplates"), array()),
        t => t.getField("Template")).as("artwork_templates"),
      coalesce(col("MinimumOrderQty").try_cast("int"), lit(1)).as("minimum_order_quantity"),
      col("CartonQty").try_cast("int").as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      col("CountryOfOrigin").as("country_of_origin"),
      col("TariffCode").as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      lit("active").as("status"),
      // Carton packaging (ref unified.jsonc:136-161): "42 x 37 x 55 cm"
      // dims (F17 parse) + "9.000 kg" gross weight (F17 weight parse).
      {
        val d = Parsers.parseDims(col("CartonDims"))
        val w = Parsers.parseWeight(col("CartonGrossWeight"))
        struct(
          lit(null).cast(graft.schema.Unified.schema("packaging").dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType]("inner_carton")
            .dataType).as("inner_carton"),
          when(coalesce(col("CartonQty").try_cast("int").cast("double"),
              d.getField("length")).isNotNull, struct(
            col("CartonQty").try_cast("int").as("qty"),
            d.getField("length").as("length"),
            d.getField("width").as("width"),
            d.getField("height").as("height"),
            coalesce(d.getField("unit"), lit("cm")).as("unit"),
            lit(null).cast("double").as("weight_net"),
            w.getField("value").as("weight_gross"),
            coalesce(w.getField("unit"), lit("kg")).as("weight_unit"),
            lit(null).cast("double").as("volume"),
            lit(null).cast("string").as("volume_unit"))).as("outer_carton"),
          lit(null).cast("string").as("type"),
          lit(null).cast("string").as("type_item"))
          .cast(graft.schema.Unified.schema("packaging").dataType).as("packaging")
      },
      lit(null).cast(graft.schema.Unified.schema("sustainability").dataType).as("sustainability"),
      lit(null).cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      array().cast("array<string>").as("related_products"),
      array().cast("array<string>").as("alternative_products"),
      lit(null).cast(graft.schema.Unified.schema("localized").dataType).as("localized"),
      lit(null).cast("map<string,string>").as("product_extra_data"),
      lit(null).cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      to_json(struct(products.columns.toSeq.map(col): _*)).as("raw_data"))
  }

  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))
}
