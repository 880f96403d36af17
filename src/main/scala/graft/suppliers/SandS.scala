package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FeedReader

/** S&S Activewear supplier pipeline: flat per-SKU rows + three
  * dimensions → unified rows.
  *
  * Feed shapes (ref: sample data/s&s.jsonc:2 products, :70 categories,
  * :90 styles, :137 specs, :164 brands): `products` is one row per
  * colour×size SKU keyed by styleID (the Ralawise-style pivot shape);
  * `styles` carries product-level title/description plus a CSV of
  * category IDs; `categories` maps id→name. Resolving the CSV is the
  * explode → broadcast-join → re-nest pattern (SURVEY F13 flavor).
  *
  * Scale: products is the big table; one hash-aggregate on styleID
  * does the variant nesting. styles/categories/specs are genuine
  * dimensions → broadcast joins, no extra shuffle. The category
  * resolution re-nest groups by styleID — co-partitioned with the
  * variant rollup key, so AQE can reuse the exchange.
  */
object SandS {

  val supplierId = "ss_activewear"

  case class Feed(doc: DataFrame) {
    def products: DataFrame = FeedReader.sectionOf(doc, "products.Response")
    def categories: DataFrame = FeedReader.sectionOf(doc, "categories.Response")
    def styles: DataFrame = FeedReader.sectionOf(doc, "styles.Response")
    def specs: DataFrame = FeedReader.sectionOf(doc, "specs.Response")
    def brands: DataFrame = FeedReader.sectionOf(doc, "brands.Response")
  }

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(FeedReader.requiredFor(
      "products.Response" -> productCols,
      "categories.Response" -> categoryCols,
      "styles.Response" -> styleCols,
      "specs.Response" -> specCols))))

  private val priceType = graft.schema.Unified.schema("base_prices").dataType
  private val imageType = graft.schema.Unified.schema("images").dataType

  private def img(url: Column, t: String, colorVariant: Column = lit(null)): Column =
    struct(url.as("url"), lit(t).as("type"),
      lit(null).cast("string").as("description"),
      colorVariant.cast("string").as("color_variant"))

  /** Strip the HTML the styles descriptions arrive in (ref:
    * s&s.jsonc:101 — `<ul><li>...`): tags → space, entities decoded
    * enough for display text. */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "<[^>]*>", " "),
      "&nbsp;", " "), "&#39;", "'"), "\\s+", " "))

  /** Column contracts per feed section (FeedReader.conform): a sparse
    * or empty capture still resolves every referenced column. */
  private val productCols: Seq[(String, String)] =
    Seq("sku", "brandName", "styleName", "colorName", "colorCode", "color1",
      "sizeName", "saleExpiration", "countryOfOrigin", "gtin",
      "colorFrontImage", "colorBackImage", "colorSideImage",
      "colorSwatchImage").map(_ -> "string") ++
      Seq("styleID" -> "long", "skuID_Master" -> "long", "caseQty" -> "int",
        "qty" -> "int", "unitWeight" -> "double", "piecePrice" -> "double",
        "dozenPrice" -> "double", "casePrice" -> "double",
        "salePrice" -> "double",
        "warehouses" -> "array<struct<warehouseAbbr:string,qty:int,expectedInventory:string>>")
  private val categoryCols: Seq[(String, String)] =
    Seq("categoryID" -> "long", "name" -> "string")
  private val styleCols: Seq[(String, String)] =
    Seq("title", "description", "baseCategory", "styleImage", "categories")
      .map(_ -> "string") ++ Seq("styleID" -> "long")
  private val specCols: Seq[(String, String)] =
    Seq("specName" -> "string", "value" -> "string") ++ Seq("styleID" -> "long")

  def unified(feed: Feed): DataFrame = {
    val productsC = FeedReader.conform(feed.products, productCols)
    val stylesC = FeedReader.conform(feed.styles, styleCols)
    // Category dimension: id → name (broadcast).
    val catDim = broadcast(FeedReader.conform(feed.categories, categoryCols).select(
      col("categoryID").cast("string").as("__cat_id"),
      trim(col("name")).as("__cat_name")))

    // styles.categories is a CSV of ids: explode → join → re-nest.
    val styleCats = stylesC
      .select(col("styleID").as("__sc_style"),
        posexplode_outer(split(coalesce(col("categories"), lit("")), ","))
          .as(Seq("__pos", "__cat_id")))
      .join(catDim, Seq("__cat_id"), "left_outer")
      .groupBy(col("__sc_style"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos").as("o"),
          struct(
            col("__cat_id").cast("string").as("id"),
            col("__cat_name").as("name"),
            lit(2).as("level"),
            lit(null).cast("string").as("parent_id")).as("v")))),
        x => x.getField("v")).as("__style_cats"))

    // Specs: per-style key/value rows → a map (F19 flavor).
    val specDim = FeedReader.conform(feed.specs, specCols)
      .groupBy(col("styleID").as("__spec_style"))
      .agg(map_from_entries(array_distinct(collect_list(
        struct(col("specName"), col("value"))))).as("__specs"))

    val styleDim = broadcast(stylesC
      .join(styleCats, col("styleID") === col("__sc_style"), "left_outer")
      .join(specDim, col("styleID") === col("__spec_style"), "left_outer")
      .select(
        col("styleID").as("__style_id"),
        col("title").as("__title"),
        stripHtml(col("description")).as("__description"),
        col("baseCategory").as("__base_category"),
        col("styleImage").as("__style_image"),
        col("__style_cats"),
        col("__specs")))

    val rows = productsC
      .join(styleDim, col("styleID") === col("__style_id"), "left_outer")

    // Tiered wholesale prices: piece (1+), dozen (12+), case (caseQty+),
    // plus a sale price bounded by saleExpiration.
    val prices = filter(array(
      struct(col("piecePrice").try_cast("double").as("value"),
        lit("USD").as("currency"), lit(1).as("min_quantity"),
        lit(11).cast("int").as("max_quantity"), lit("unit").as("type"),
        lit("piece").cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until")),
      struct(col("dozenPrice").try_cast("double").as("value"),
        lit("USD").as("currency"), lit(12).as("min_quantity"),
        (coalesce(col("caseQty").try_cast("int"), lit(0)) - 1).as("max_quantity"),
        lit("unit").as("type"), lit("dozen").cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until")),
      struct(col("casePrice").try_cast("double").as("value"),
        lit("USD").as("currency"),
        coalesce(col("caseQty").try_cast("int"), lit(1)).as("min_quantity"),
        lit(null).cast("int").as("max_quantity"), lit("unit").as("type"),
        lit("case").cast("string").as("description"),
        lit(null).cast("timestamp").as("valid_until")),
      struct(col("salePrice").try_cast("double").as("value"),
        lit("USD").as("currency"), lit(1).as("min_quantity"),
        lit(null).cast("int").as("max_quantity"), lit("unit").as("type"),
        lit("sale").cast("string").as("description"),
        col("saleExpiration").try_cast("timestamp").as("valid_until"))),
      p => p.getField("value").isNotNull && p.getField("value") > 0)

    // Stock: total qty, per-warehouse due-ins (expected inventory), and
    // the per-warehouse snapshot itself (ref unified.jsonc:249-257
    // stock.locations — warehouseAbbr is both id and name; the feed
    // carries no per-warehouse country).
    val stock = struct(
      coalesce(col("qty").try_cast("int"), lit(0)).as("available"),
      filter(transform(coalesce(col("warehouses"), array()), w => struct(
        w.getField("qty").try_cast("int").as("quantity"),
        w.getField("expectedInventory").cast("string").as("expected_date"))),
        d => d.getField("quantity").isNotNull).as("due_ins"),
      filter(transform(coalesce(col("warehouses"), array()), w => struct(
        w.getField("warehouseAbbr").cast("string").as("id"),
        w.getField("warehouseAbbr").cast("string").as("name"),
        lit(null).cast("string").as("country"),
        w.getField("qty").try_cast("int").as("qty"))),
        l => l.getField("qty").isNotNull).as("locations"),
      lit(null).cast("timestamp").as("last_updated"))

    val colorImages = filter(array(
      img(col("colorFrontImage"), "front", col("colorName")),
      img(col("colorBackImage"), "back", col("colorName")),
      img(col("colorSideImage"), "side", col("colorName")),
      img(col("colorSwatchImage"), "swatch", col("colorName"))),
      i => i.getField("url").isNotNull && i.getField("url") =!= "")

    val variantStruct = struct(
      coalesce(col("sku"), lit("")).as("sku"),
      col("skuID_Master").cast("string").as("variant_id"),
      struct(
        coalesce(col("colorCode"), lit("")).as("code"),
        coalesce(col("colorName"), lit("")).as("name"),
        nullif(col("color1"), lit("")).as("hex_color"),
        lit(null).cast("string").as("pms_color"),
        colorImages.cast(imageType).as("images"),
        lit("active").as("status")).as("color"),
      col("sizeName").as("size"),
      lit(null).cast("string").as("material_variant"),
      lit(null).cast(graft.schema.Unified.schema("dimensions").dataType).as("dimensions"),
      when(col("unitWeight").isNotNull,
        struct(col("unitWeight").try_cast("double").as("value"), lit("lb").as("unit")))
        .as("weight"),
      prices.cast(priceType).as("prices"),
      stock.as("stock"),
      colorImages.cast(imageType).as("images"),
      lit("active").as("status"),
      nullif(col("gtin"), lit("")).as("gtin"))

    val parentCols = Seq("brandName", "styleName", "countryOfOrigin",
      "caseQty", "__title", "__description", "__base_category",
      "__style_image", "__style_cats", "__specs")

    val grouped = graft.operators.Nest.rollupWithParent(
      rows, Seq("styleID"), parentCols,
      variantStruct.cast(graft.schema.Unified.schema("variants").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType),
      col("sku"), "variants")

    val categories = concat(
      filter(array(struct(
        lit(null).cast("string").as("id"), col("__base_category").as("name"),
        lit(1).as("level"), lit(null).cast("string").as("parent_id"))),
        c => c.getField("name").isNotNull && c.getField("name") =!= ""),
      coalesce(col("__style_cats"),
        array().cast(graft.schema.Unified.schema("categories").dataType)))

    grouped.select(
      concat(lit("ss_"), coalesce(col("styleID").cast("string"), lit(""))).as("product_id"),
      struct(lit(supplierId).as("id"), lit("S&S Activewear").as("name"),
        lit("v2").cast("string").as("api_version"),
        lit(null).cast("map<string,string>").as("contact_info")).as("supplier"),
      coalesce(col("styleName"), col("styleID").cast("string"), lit(""))
        .as("supplier_product_code"),
      coalesce(col("__title"), col("styleName"), lit("")).as("name"),
      col("__title").as("title"),
      lit(null).cast("string").as("short_description"),
      col("__description").as("long_description"),
      array().cast("array<string>").as("keywords"),
      categories.cast(graft.schema.Unified.schema("categories").dataType).as("categories"),
      nullif(col("brandName"), lit("")).as("brand"),
      lit(null).cast(graft.schema.Unified.schema("dimensions").dataType).as("dimensions"),
      try_element_at(col("variants"), lit(1)).getField("weight").as("weight"),
      try_element_at(col("__specs"), lit("Fabric")).as("material"),
      array_distinct(filter(
        transform(col("variants"), v => v.getField("color").getField("name")),
        c => c.isNotNull)).as("colors_available"),
      col("variants"),
      try_element_at(col("variants"), lit(1)).getField("prices").as("base_prices"),
      lit(false).as("is_printable"),
      array().cast(graft.schema.Unified.schema("print_positions").dataType).as("print_positions"),
      array().cast(graft.schema.Unified.schema("print_options").dataType).as("print_options"),
      filter(array(img(col("__style_image"), "style")),
        i => i.getField("url").isNotNull && i.getField("url") =!= "")
        .cast(imageType).as("images"),
      array().cast("array<string>").as("artwork_templates"),
      lit(1).as("minimum_order_quantity"),
      col("caseQty").try_cast("int").as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      nullif(col("countryOfOrigin"), lit("")).as("country_of_origin"),
      lit(null).cast("string").as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      lit("active").as("status"),
      lit(null).cast(graft.schema.Unified.schema("packaging").dataType).as("packaging"),
      lit(null).cast(graft.schema.Unified.schema("sustainability").dataType).as("sustainability"),
      lit(null).cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      array().cast("array<string>").as("related_products"),
      array().cast("array<string>").as("alternative_products"),
      lit(null).cast(graft.schema.Unified.schema("localized").dataType).as("localized"),
      lit(null).cast("map<string,string>").as("product_extra_data"),
      lit(null).cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      // Style-level source fields + spec map (ref
      // unified_product_schema.py:201).
      to_json(struct(col("styleID"), col("brandName"), col("styleName"),
        col("countryOfOrigin"), col("caseQty"), col("__title").as("title"),
        col("__description").as("description"),
        col("__base_category").as("baseCategory"),
        col("__specs").as("specs"))).as("raw_data"))
  }

  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))
}
