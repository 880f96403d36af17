package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FeedReader

/** Keramikos supplier pipeline: ceramics catalog with boolean print
  * -capability flags, key-value specification rows, and a qty×colours
  * print-price grid (ref: sample data/Keramikos Sample
  * Data.jsonc:2 products, :3565 categories, :3591 print-types,
  * :3626 prices; grid shape also at flat-structure/keramikos.json:9-40
  * — the SURVEY J6 two-dimensional tier example).
  */
object Keramikos {

  val supplierId = "keramikos"

  /** Boolean capability flag → canonical technique. */
  val printFlagMap: Seq[(String, String)] = Seq(
    "PrintDirect" -> "screen_print",   // "Direct" = screen printing (print-types notes)
    "PrintTransfer" -> "transfer",
    "PrintDigital" -> "digital_print",
    "PrintDyeSublimation" -> "sublimation",
    "PrintFullColour" -> "full_color")

  case class Feed(doc: DataFrame) {
    def products: DataFrame = FeedReader.sectionOf(doc, "all-products-and-prices.Response")
    def categories: DataFrame = FeedReader.sectionOf(doc, "categories.Response")
    def printTypes: DataFrame = FeedReader.sectionOf(doc, "print-types.Response")
    def prices: DataFrame = FeedReader.sectionOf(doc, "prices.Response")
  }

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(FeedReader.requiredFor(
      "all-products-and-prices.Response" -> productCols,
      "prices.Response" -> priceCols))))

  /** Column contracts (FeedReader.conform): sparse captures resolve
    * every referenced column/nested field. */
  private val productCols: Seq[(String, String)] =
    (Seq("Prodcode", "Name", "Description", "Brand", "CategoryName",
      "ShapeName", "ImageUri", "HiresImageUri").map(_ -> "string") ++
      printFlagMap.map(_._1 -> "boolean") ++ Seq(
      "ProductId" -> "long", "Discontinued" -> "boolean",
      "QuantityPerBox" -> "string",
      "ProductSpecifications" ->
        "array<struct<SpecificationText:string,SpecificationValue:string>>"))
  private val priceCols: Seq[(String, String)] =
    Seq("prodCode" -> "string", "printTypeName" -> "string",
      "printPrices" ->
        "array<struct<unitPrice:string,quantityFrom:string,numberOfColours:string>>")

  def unified(feed: Feed): DataFrame = {
    val products = FeedReader.conform(feed.products, productCols)

    // Key-value specification rows → a lookup map per product.
    val specs = map_from_entries(transform(
      coalesce(col("ProductSpecifications"), array()),
      s => struct(s.getField("SpecificationText"), s.getField("SpecificationValue"))))

    // J6 data: the prices endpoint carries one product's print-price
    // grid (quantityFrom × numberOfColours); join it on prodCode and
    // express it as tier prices on the matching print option.
    val grid = broadcast(FeedReader.conform(feed.prices, priceCols).select(
      col("prodCode").as("__price_code"),
      col("printTypeName").as("__price_type"),
      transform(col("printPrices"), p => struct(
        p.getField("unitPrice").cast("double").as("value"),
        lit("GBP").as("currency"),
        p.getField("quantityFrom").cast("int").as("min_quantity"),
        lit(null).cast("int").as("max_quantity"),
        lit("unit").as("type"),
        concat(lit("colours="), p.getField("numberOfColours").cast("string")).as("description"),
        lit(null).cast("timestamp").as("valid_until")))
        .cast(graft.schema.Unified.schema("base_prices").dataType).as("__grid_prices")))

    val base = products.join(grid, col("Prodcode") === col("__price_code"), "left_outer")

    val techniques = printFlagMap.map { case (flag, tech) =>
      when(coalesce(col(flag), lit(false)), lit(tech)) }
    val techniquesArr = array_compact(array(techniques: _*))

    val printOptions = filter(
      transform(techniquesArr, tech => struct(
        tech.as("technique"),
        lit("various").as("position"),
        lit(1).as("max_colors"),
        lit(null).cast("double").as("setup_charge"),
        // Attach the joined grid to the option the grid names
        // ("Digital Printing" → digital_print), empty elsewhere.
        when(tech === "digital_print" && col("__price_type").isNotNull &&
            lower(col("__price_type")).contains("digital"), col("__grid_prices"))
          .otherwise(array().cast(graft.schema.Unified.schema("base_prices").dataType))
          .as("prices"),
        lit(null).cast("string").as("lead_time"),
        lit(false).as("is_default"),
          lit(null).cast("map<string,string>").as("technique_names"))),
      o => o.getField("technique").isNotNull)

    val images = filter(array(
      struct(col("ImageUri").as("url"), lit("standard").as("type"),
        lit(null).cast("string").as("description"), lit(null).cast("string").as("color_variant")),
      struct(col("HiresImageUri").as("url"), lit("hires").as("type"),
        lit(null).cast("string").as("description"), lit(null).cast("string").as("color_variant"))),
      i => i.getField("url").isNotNull)

    val weight = {
      val w = element_at(specs, "Weight (g)").try_cast("double")
      when(w.isNotNull, struct(w.as("value"), lit("g").as("unit")))
    }
    val dims = {
      val h = element_at(specs, "Height (mm)").try_cast("double")
      val dia = element_at(specs, "Diameter (mm)").try_cast("double")
      when(coalesce(h, dia).isNotNull, struct(
        lit(null).cast("double").as("length"), lit(null).cast("double").as("width"),
        h.as("height"), dia.as("diameter"), lit("mm").as("unit")))
    }

    val status = when(coalesce(col("Discontinued"), lit(false)), "discontinued")
      .otherwise("active")

    val variant = struct(
      coalesce(col("Prodcode"), lit("")).as("sku"),
      col("ProductId").cast("string").as("variant_id"),
      lit(null).cast(graft.schema.Unified.schema("variants").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]("color").dataType).as("color"),
      lit(null).cast("string").as("size"),
      nullif(col("ShapeName"), lit("")).as("material_variant"),
      lit(null).cast(graft.schema.Unified.schema("dimensions").dataType).as("dimensions"),
      lit(null).cast(graft.schema.Unified.schema("weight").dataType).as("weight"),
      array().cast(graft.schema.Unified.schema("base_prices").dataType).as("prices"),
      lit(null).cast(graft.schema.Unified.schema("variants").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]("stock").dataType).as("stock"),
      images.cast(graft.schema.Unified.schema("images").dataType).as("images"),
      status.as("status"),
      lit(null).cast("string").as("gtin"))

    base.select(
      concat(lit("keramikos_"), coalesce(col("Prodcode"), lit(""))).as("product_id"),
      struct(lit(supplierId).as("id"), lit("Keramikos").as("name"),
        lit(null).cast("string").as("api_version"),
        lit(null).cast("map<string,string>").as("contact_info")).as("supplier"),
      coalesce(col("Prodcode"), lit("")).as("supplier_product_code"),
      coalesce(col("Name"), lit("")).as("name"),
      lit(null).cast("string").as("title"),
      col("Description").as("short_description"),
      lit(null).cast("string").as("long_description"),
      array().cast("array<string>").as("keywords"),
      filter(array(struct(
        lit(null).cast("string").as("id"), col("CategoryName").as("name"),
        lit(1).as("level"), lit(null).cast("string").as("parent_id"))),
        c => c.getField("name").isNotNull)
        .cast(graft.schema.Unified.schema("categories").dataType).as("categories"),
      nullif(col("Brand"), lit("")).as("brand"),
      dims.as("dimensions"),
      weight.as("weight"),
      lit(null).cast("string").as("material"),
      array().cast("array<string>").as("colors_available"),
      array(variant).cast(graft.schema.Unified.schema("variants").dataType).as("variants"),
      array().cast(graft.schema.Unified.schema("base_prices").dataType).as("base_prices"),
      (size(techniquesArr) > 0).as("is_printable"),
      array().cast(graft.schema.Unified.schema("print_positions").dataType).as("print_positions"),
      printOptions.cast(graft.schema.Unified.schema("print_options").dataType).as("print_options"),
      images.cast(graft.schema.Unified.schema("images").dataType).as("images"),
      array().cast("array<string>").as("artwork_templates"),
      lit(1).as("minimum_order_quantity"),
      col("QuantityPerBox").try_cast("int").as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      lit(null).cast("string").as("country_of_origin"),
      lit(null).cast("string").as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      status.as("status"),
      lit(null).cast(graft.schema.Unified.schema("packaging").dataType).as("packaging"),
      lit(null).cast(graft.schema.Unified.schema("sustainability").dataType).as("sustainability"),
      lit(null).cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      array().cast("array<string>").as("related_products"),
      array().cast("array<string>").as("alternative_products"),
      lit(null).cast(graft.schema.Unified.schema("localized").dataType).as("localized"),
      // Open attributes (ref unified.jsonc:94 shapeName).
      map_filter(map(lit("shapeName"), nullif(col("ShapeName"), lit(""))),
        (_, v) => v.isNotNull).as("product_extra_data"),
      lit(null).cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      to_json(struct(products.columns.toSeq.map(col): _*)).as("raw_data"))
  }

  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))
}
