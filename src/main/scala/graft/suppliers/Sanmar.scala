package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FeedReader

/** Sanmar supplier pipeline: PromoStandards service captures → unified
  * rows.
  *
  * Feed shapes (ref: sample data/Sanmar Sample Data.jsonc:2
  * GetProductSellable, :31 GetProduct, :452 GetMediaContent-ish
  * sections, GetConfigurationAndPricing, GetInventoryLevels): nested
  * service envelopes (`XArray.X`) where singleton lists collapse to
  * bare objects — normalized via [[FeedReader.asArray]]. The product
  * body carries parts (colour variants); media, part prices, and
  * per-location inventory arrive as separate services keyed by partId
  * and are joined in (J1/J4 flavor).
  *
  * Scale: each service response is a per-product document; the part
  * joins key on partId. Media/pricing/inventory aggregates group by
  * partId before the join (pre-aggregated dimensions), then one
  * hash-aggregate nests parts per productId. At fleet scale (many
  * product documents per file directory) all joins are plain shuffled
  * equi-joins on partId — no driver-side loops anywhere.
  */
object Sanmar {

  val supplierId = "sanmar"

  case class Feed(doc: DataFrame) {
    def product: DataFrame = FeedReader.sectionOf(doc, "GetProduct.Response.Product")
    def sellable: DataFrame =
      FeedReader.sectionOf(doc, "GetProductSellable.Response.ProductSellableArray.ProductSellable")
    def media: DataFrame =
      FeedReader.sectionOf(doc, "GetMediaContent.Response.MediaContentArray.MediaContent")
    def pricing: DataFrame =
      FeedReader.sectionOf(doc, "GetConfigurationAndPricing.Response.Configuration")
    def inventory: DataFrame =
      FeedReader.sectionOf(doc, "GetInventoryLevels.Response.Inventory")
  }

  /** Source contract (see FeedReader.mergeSchemas): every referenced
    * field declared so sparse captures parse to typed nulls instead of
    * failing analysis; PromoStandards singleton collapse is tolerated
    * (declared arrays merge into bare-object captures). */
  private val requiredSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """GetProduct STRUCT<Response: STRUCT<Product: STRUCT<
      |  productId: STRING, productName: STRING, productBrand: STRING,
      |  primaryImageUrl: STRING, lastChangeDate: STRING, creationDate: STRING,
      |  description: ARRAY<STRING>,
      |  ProductCategoryArray: STRUCT<ProductCategory: ARRAY<STRUCT<
      |    category: STRING, subCategory: STRING>>>,
      |  RelatedProductArray: STRUCT<RelatedProduct: ARRAY<STRUCT<
      |    relationType: STRING, productId: STRING>>>,
      |  ProductKeywordArray: STRUCT<ProductKeyword: ARRAY<STRUCT<keyword: STRING>>>,
      |  ProductPartArray: STRUCT<ProductPart: ARRAY<STRUCT<
      |    partId: STRING, isCloseout: STRING, gtin: STRING,
      |    Dimension: STRUCT<dimensionUom: STRING, weightUom: STRING,
      |      weight: STRING, depth: STRING, width: STRING, height: STRING>,
      |    primaryColor: STRUCT<Color: STRUCT<colorName: STRING,
      |      standardColorName: STRING>>,
      |    ColorArray: STRUCT<Color: STRUCT<approximatePms: STRING>>,
      |    ApparelSize: STRUCT<labelSize: STRING>>>>>>>,
      |GetMediaContent STRUCT<Response: STRUCT<MediaContentArray: STRUCT<
      |  MediaContent: ARRAY<STRUCT<partId: STRING, mediaType: STRING,
      |    url: STRING, color: STRING,
      |    ClassTypeArray: STRUCT<ClassType: STRUCT<classTypeName: STRING>>>>>>>,
      |GetConfigurationAndPricing STRUCT<Response: STRUCT<Configuration: STRUCT<
      |  currency: STRING,
      |  PartArray: STRUCT<Part: ARRAY<STRUCT<partId: STRING,
      |    PartPriceArray: STRUCT<PartPrice: ARRAY<STRUCT<
      |      price: STRING, minQuantity: STRING, priceExpiryDate: STRING>>>>>>>>>,
      |GetInventoryLevels STRUCT<Response: STRUCT<Inventory: STRUCT<
      |  PartInventoryArray: STRUCT<PartInventory: ARRAY<STRUCT<
      |    partId: STRING,
      |    quantityAvailable: STRUCT<Quantity: STRUCT<value: STRING>>,
      |    InventoryLocationArray: STRUCT<InventoryLocation: ARRAY<STRUCT<
      |      inventoryLocationId: STRING, inventoryLocationName: STRING,
      |      country: STRING,
      |      inventoryLocationQuantity: STRUCT<Quantity: STRUCT<value: STRING>>>>>>>>>>>
      |""".stripMargin)

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(requiredSchema)))

  private val priceType = graft.schema.Unified.schema("base_prices").dataType
  private val imageType = graft.schema.Unified.schema("images").dataType

  /** Inventory per part: available total + per-location snapshot
    * (ref Sanmar Sample Data.jsonc:430-560 PartInventory with
    * InventoryLocationArray → unified.jsonc:249-257 stock.locations).
    * Package-visible so the golden spec can pin the location extraction
    * even when a capture's inventory parts don't match its product
    * parts (true of the reference sample). */
  private[graft] def stockByPart(feed: Feed): DataFrame = {
    val invParts = feed.inventory.select(
      explode(FeedReader.asArray(feed.inventory,
        col("PartInventoryArray.PartInventory"))).as("__inv"))
    invParts.select(
      col("__inv.partId").as("__stock_part"),
      struct(
        coalesce(col("__inv.quantityAvailable.Quantity.value").try_cast("int"),
          lit(0)).as("available"),
        array().cast(graft.schema.Unified.stockSchema("due_ins").dataType)
          .as("due_ins"),
        filter(transform(
          FeedReader.asArray(invParts,
            col("__inv.InventoryLocationArray.InventoryLocation")),
          l => struct(
            l.getField("inventoryLocationId").cast("string").as("id"),
            l.getField("inventoryLocationName").cast("string").as("name"),
            l.getField("country").cast("string").as("country"),
            l.getField("inventoryLocationQuantity").getField("Quantity")
              .getField("value").try_cast("int").as("qty"))),
          l => l.getField("qty").isNotNull)
          .cast(graft.schema.Unified.stockLocationsType).as("locations"),
        lit(null).cast("timestamp").as("last_updated")).as("__stock"))
  }

  def unified(feed: Feed): DataFrame = {
    val product = feed.product

    // Media images grouped per part.
    val mediaByPart = feed.media
      .filter(col("mediaType") === "Image")
      .groupBy(col("partId").as("__media_part"))
      .agg(transform(
        array_sort(collect_list(struct(col("url").as("o"), struct(
          col("url").as("url"),
          lower(coalesce(col("ClassTypeArray.ClassType.classTypeName"),
            lit("image"))).as("type"),
          lit(null).cast("string").as("description"),
          col("color").cast("string").as("color_variant")).as("v")))),
        x => x.getField("v")).as("__media_images"))

    // Part price tiers from the pricing service.
    val pricingParts = feed.pricing.select(
      col("currency").as("__currency"),
      explode(FeedReader.asArray(feed.pricing, col("PartArray.Part"))).as("__part"))
    val pricesByPart = pricingParts.select(
      col("__part.partId").as("__price_part"),
      transform(
        FeedReader.asArray(pricingParts, col("__part.PartPriceArray.PartPrice")),
        p => struct(
          p.getField("price").cast("double").as("value"),
          coalesce(col("__currency"), lit("USD")).as("currency"),
          coalesce(p.getField("minQuantity").cast("int"), lit(1)).as("min_quantity"),
          lit(null).cast("int").as("max_quantity"),
          lit("unit").as("type"),
          lit(null).cast("string").as("description"),
          p.getField("priceExpiryDate").try_cast("timestamp").as("valid_until")))
        .as("__part_prices"))

    val stockByPart = Sanmar.stockByPart(feed)

    // Parts (colour variants) out of the product body.
    val parts = product.select(
      col("productId"), col("productName"), col("description"),
      col("productBrand"), col("primaryImageUrl"),
      col("ProductCategoryArray"), col("ProductKeywordArray"),
      col("lastChangeDate"), col("creationDate"),
      explode_outer(FeedReader.asArray(product, col("ProductPartArray.ProductPart")))
        .as("__part"))

    val joined = parts
      .join(mediaByPart, col("__part.partId") === col("__media_part"), "left_outer")
      .join(pricesByPart, col("__part.partId") === col("__price_part"), "left_outer")
      .join(stockByPart, col("__part.partId") === col("__stock_part"), "left_outer")

    // Dimension arrives in feet ("FT") / ounces ("OZ") — normalize to
    // the unified unit enums (in / oz).
    val dimUom = upper(coalesce(col("__part.Dimension.dimensionUom"), lit("IN")))
    val dimScale = when(dimUom === "FT", lit(12.0)).otherwise(lit(1.0))
    val d = (f: String) =>
      (col(s"__part.Dimension.$f").try_cast("double") * dimScale)
    val dims = when(
      coalesce(d("depth"), d("width"), d("height")).isNotNull &&
        (coalesce(d("depth"), lit(0.0)) + coalesce(d("width"), lit(0.0)) +
          coalesce(d("height"), lit(0.0))) > 0,
      struct(d("depth").as("length"), d("width").as("width"),
        d("height").as("height"), lit(null).cast("double").as("diameter"),
        lit("in").as("unit")))

    val weightUom = lower(coalesce(col("__part.Dimension.weightUom"), lit("OZ")))
    val weight = when(col("__part.Dimension.weight").isNotNull, struct(
      col("__part.Dimension.weight").try_cast("double").as("value"),
      when(weightUom.isin("lb", "lbs"), "lb").otherwise("oz").as("unit")))

    val variantStruct = struct(
      coalesce(col("__part.partId"), lit("")).as("sku"),
      col("__part.partId").as("variant_id"),
      when(col("__part.primaryColor.Color.colorName").isNotNull, struct(
        coalesce(col("__part.primaryColor.Color.standardColorName"),
          col("__part.primaryColor.Color.colorName"), lit("")).as("code"),
        coalesce(col("__part.primaryColor.Color.colorName"), lit("")).as("name"),
        lit(null).cast("string").as("hex_color"),
        col("__part.ColorArray.Color.approximatePms").cast("string").as("pms_color"),
        array().cast(imageType).as("images"),
        lit("active").as("status"))).as("color"),
      col("__part.ApparelSize.labelSize").cast("string").as("size"),
      lit(null).cast("string").as("material_variant"),
      dims.as("dimensions"),
      weight.as("weight"),
      coalesce(col("__part_prices"), array().cast(priceType))
        .cast(priceType).as("prices"),
      col("__stock").as("stock"),
      coalesce(col("__media_images"), array().cast(imageType))
        .cast(imageType).as("images"),
      when(coalesce(col("__part.isCloseout").try_cast("boolean"), lit(false)),
        "discontinued").otherwise("active").as("status"),
      col("__part.gtin").cast("string").as("gtin"))

    val variantsByProduct = joined
      .groupBy(col("productId"))
      .agg(transform(
        array_sort(collect_list(struct(col("__part.partId").as("o"),
          variantStruct.cast(graft.schema.Unified.schema("variants").dataType
            .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
            .as("v")))),
        x => x.getField("v")).as("variants"))

    val base = product.join(variantsByProduct, Seq("productId"), "left_outer")

    val keywords = array_distinct(transform(
      FeedReader.asArray(product, col("ProductKeywordArray.ProductKeyword")),
      k => k.getField("keyword")))

    val categories = {
      val cats = FeedReader.asArray(product, col("ProductCategoryArray.ProductCategory"))
      flatten(transform(cats, c => filter(array(
        struct(lit(null).cast("string").as("id"),
          c.getField("category").as("name"), lit(1).as("level"),
          lit(null).cast("string").as("parent_id")),
        struct(lit(null).cast("string").as("id"),
          c.getField("subCategory").as("name"), lit(2).as("level"),
          c.getField("category").cast("string").as("parent_id"))),
        x => x.getField("name").isNotNull)))
    }

    // description[] is bullet lines: first = short, all = long (ref:
    // Sanmar Sample Data.jsonc:36-47).
    val descArr = FeedReader.asArray(product, col("description"))

    // Related products (ref: Sanmar Sample Data.jsonc:165-170): the
    // PromoStandards relation set; "Substitute" relations are the
    // unified alternativeProducts, anything else (e.g. "Companion
    // Sell") relatedProducts. Sorted-distinct — the envelope order is
    // not meaningful.
    val relatedArr =
      FeedReader.asArray(product, col("RelatedProductArray.RelatedProduct"))
    def relationCodes(pick: Column => Column): Column =
      array_sort(array_distinct(transform(
        filter(relatedArr, r => r.getField("productId").isNotNull &&
          pick(coalesce(r.getField("relationType"), lit("")))),
        r => r.getField("productId").cast("string"))))

    base.select(
      concat(lit("sanmar_"), coalesce(col("productId"), lit(""))).as("product_id"),
      struct(lit(supplierId).as("id"), lit("Sanmar").as("name"),
        lit("PromoStandards-V2").cast("string").as("api_version"),
        lit(null).cast("map<string,string>").as("contact_info")).as("supplier"),
      coalesce(col("productId"), lit("")).as("supplier_product_code"),
      coalesce(col("productName"), lit("")).as("name"),
      lit(null).cast("string").as("title"),
      try_element_at(descArr, lit(1)).cast("string").as("short_description"),
      concat_ws("\n", descArr).as("long_description"),
      keywords.cast("array<string>").as("keywords"),
      categories.cast(graft.schema.Unified.schema("categories").dataType).as("categories"),
      nullif(col("productBrand"), lit("")).as("brand"),
      try_element_at(col("variants"), lit(1)).getField("dimensions").as("dimensions"),
      try_element_at(col("variants"), lit(1)).getField("weight").as("weight"),
      lit(null).cast("string").as("material"),
      array_distinct(filter(
        transform(col("variants"), v => v.getField("color").getField("name")),
        c => c.isNotNull)).as("colors_available"),
      coalesce(col("variants"),
        array().cast(graft.schema.Unified.schema("variants").dataType)).as("variants"),
      try_element_at(col("variants"), lit(1)).getField("prices").as("base_prices"),
      lit(false).as("is_printable"),
      array().cast(graft.schema.Unified.schema("print_positions").dataType).as("print_positions"),
      array().cast(graft.schema.Unified.schema("print_options").dataType).as("print_options"),
      filter(array(struct(
        col("primaryImageUrl").as("url"), lit("primary").as("type"),
        lit(null).cast("string").as("description"),
        lit(null).cast("string").as("color_variant"))),
        i => i.getField("url").isNotNull).cast(imageType).as("images"),
      array().cast("array<string>").as("artwork_templates"),
      lit(1).as("minimum_order_quantity"),
      lit(null).cast("int").as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      lit(null).cast("string").as("country_of_origin"),
      lit(null).cast("string").as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      lit("active").as("status"),
      lit(null).cast(graft.schema.Unified.schema("packaging").dataType).as("packaging"),
      lit(null).cast(graft.schema.Unified.schema("sustainability").dataType).as("sustainability"),
      // Lifecycle (ref unified.jsonc:14-22): PromoStandards carries
      // creation + last-change service dates.
      struct(
        lit(null).cast("string").as("type_of_product"),
        lit(null).cast("string").as("product_lifecycle"),
        lit(null).cast("timestamp").as("intro_date"),
        col("creationDate").try_cast("timestamp").as("release_date"),
        col("lastChangeDate").try_cast("timestamp").as("modified_date"),
        lit(null).cast("timestamp").as("discontinued_date"))
        .cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      relationCodes(t => t =!= "Substitute").cast("array<string>")
        .as("related_products"),
      relationCodes(t => t === "Substitute").cast("array<string>")
        .as("alternative_products"),
      lit(null).cast(graft.schema.Unified.schema("localized").dataType).as("localized"),
      lit(null).cast("map<string,string>").as("product_extra_data"),
      col("creationDate").try_cast("timestamp").as("created_at"),
      col("lastChangeDate").try_cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      // Full product service body (ref unified_product_schema.py:201).
      to_json(struct(product.columns.toSeq.map(col): _*)).as("raw_data"))
  }

  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))
}
