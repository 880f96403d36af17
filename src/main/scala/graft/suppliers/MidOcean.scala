package graft.suppliers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Parsers
import graft.sources.FeedReader

/** MidOcean supplier pipeline: 5-endpoint feed → unified product rows
  * (ref: etl/transformers/midocean_transformer.py, the only
  * reference-implemented supplier, so it defines parity semantics).
  *
  * Spark-first design notes:
  *  - The variant⋈pricelist join (J1) is a broadcast hash equi-join on
  *    sku (the pricelist is a KB-scale dimension; the reference builds
  *    the same hash map by hand — midocean_extractor.py:195-209).
  *  - Variant order is load-bearing ("first variant" feeds categories,
  *    base prices and main images — midocean_transformer.py:247,323,367),
  *    so the explode→join→re-nest carries a posexplode index and
  *    re-sorts on it (SURVEY §7.4 risk 1).
  *  - Print options come from the global printpricelist (not keyed by
  *    product — midocean_transformer.py:433), so they are computed once
  *    and attached via crossJoin(broadcast(singleRow)) — one tiny
  *    broadcast, no shuffle of the product side.
  *  - Everything is built-in columnar expressions (HOFs, when/coalesce):
  *    zero UDFs, the whole plan stays in whole-stage codegen.
  */
object MidOcean {

  val supplierId = "midocean"

  /** Print technique code → canonical technique (the reference's
    * 70-entry dict, kept as data: midocean_transformer.py:29-95).
    * Unknown codes are dropped by lookups returning null. */
  val techniqueMap: Map[String, String] = {
    def fam(prefix: String, n: Int, v: String) =
      (0 until n).map(i => s"$prefix$i" -> v)
    (Seq("B" -> "debossing", "E" -> "embroidery",
      "ST" -> "screen_print", "T1" -> "transfer", "TD" -> "transfer",
      "TD1" -> "transfer", "TDT" -> "transfer", "TT" -> "transfer",
      "TR" -> "transfer", "TC" -> "transfer",
      "TS" -> "sublimation", "TS1" -> "sublimation", "TS2" -> "sublimation",
      "TS3" -> "sublimation", "TS4" -> "sublimation", "TSM" -> "sublimation",
      "TST" -> "sublimation", "RL" -> "laser_engraving") ++
      fam("L", 8, "laser_engraving") ++ fam("P", 8, "pad_print") ++
      fam("PD", 8, "digital_print") ++ fam("S", 8, "screen_print") ++
      fam("ST", 3, "screen_print") ++ fam("RS", 8, "screen_print") ++
      fam("RD", 4, "digital_print")).toMap
  }

  private val techMapCol: Column =
    map(techniqueMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** The five correlated endpoints of one capture document (S5). */
  case class Feed(doc: DataFrame) {
    def products: DataFrame = FeedReader.sectionOf(doc, "products.Response")
    def pricelist: DataFrame = doc
      .select(explode(col("pricelist.Response.price")).as("p")).select(col("p.*"))
    def printdataProducts: DataFrame = doc
      .select(explode(col("printdata.Response.products")).as("p")).select(col("p.*"))
    def printTechniques: DataFrame = doc
      .select(posexplode(col("printpricelist.Response.print_techniques")))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "t")
    /** Per-language technique display names (ref: MidOcean Sample
      * Data.jsonc:861-960 — one `{lang: name}` singleton per list
      * element, the F19 shape). */
    def techniqueDescriptions: DataFrame = doc
      .select(explode(col("printdata.Response.printing_technique_descriptions"))
        .as("d")).select(col("d.*"))
    def stock: DataFrame = doc
      .select(explode(col("stock.Response.stock")).as("s")).select(col("s.*"))
  }

  /** Source contract: every field the transform references, declared
    * so sparse captures (fields no row materializes, or a missing
    * endpoint) parse to typed nulls instead of failing analysis. Types
    * are strings — use-sites parse/try_cast; present fields keep their
    * inferred types (FeedReader.mergeSchemas). */
  private val requiredSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """products STRUCT<Response: ARRAY<STRUCT<
      |  master_code: STRING, product_name: STRING, short_description: STRING,
      |  long_description: STRING, brand: STRING, material: STRING,
      |  product_class: STRING, length: STRING, width: STRING, height: STRING,
      |  length_unit: STRING, gross_weight: STRING, net_weight: STRING,
      |  gross_weight_unit: STRING, printable: STRING,
      |  outer_carton_quantity: STRING, country_of_origin: STRING,
      |  commodity_code: STRING, master_id: STRING, type_of_products: STRING,
      |  number_of_print_positions: STRING, volume: STRING, volume_unit: STRING,
      |  inner_carton_quantity: STRING, timestamp: STRING,
      |  carton_length: STRING, carton_length_unit: STRING,
      |  carton_width: STRING, carton_height: STRING,
      |  carton_volume: STRING, carton_volume_unit: STRING,
      |  carton_gross_weight: STRING, carton_gross_weight_unit: STRING,
      |  variants: ARRAY<STRUCT<
      |    sku: STRING, variant_id: STRING, color_code: STRING,
      |    color_description: STRING, pms_color: STRING, gtin: STRING,
      |    category_level1: STRING, category_level2: STRING,
      |    category_level3: STRING, plc_status_description: STRING,
      |    discontinued_date: STRING,
      |    digital_assets: ARRAY<STRUCT<type: STRING, subtype: STRING, url: STRING>>>>>>>,
      |pricelist STRUCT<Response: STRUCT<price: ARRAY<STRUCT<
      |  sku: STRING, price: STRING, valid_until: STRING>>>>,
      |printdata STRUCT<Response: STRUCT<
      |  printing_technique_descriptions: ARRAY<STRUCT<
      |    id: STRING, name: ARRAY<STRUCT<en: STRING>>>>,
      |  products: ARRAY<STRUCT<
      |  master_code: STRING,
      |  printing_positions: ARRAY<STRUCT<
      |    position_id: STRING, max_print_size_width: STRING,
      |    max_print_size_height: STRING,
      |    printing_techniques: ARRAY<STRUCT<id: STRING>>,
      |    images: ARRAY<STRUCT<print_position_image_with_area: STRING>>>>>>>>,
      |printpricelist STRUCT<Response: STRUCT<print_techniques: ARRAY<STRUCT<
      |  id: STRING, setup: STRING,
      |  var_costs: ARRAY<STRUCT<scales: ARRAY<STRUCT<
      |    price: STRING, minimum_quantity: STRING>>>>>>>>,
      |stock STRUCT<Response: STRUCT<stock: ARRAY<STRUCT<sku: STRING, qty: STRING>>>>
      |""".stripMargin)

  def readFeed(spark: SparkSession, path: String): Feed =
    Feed(FeedReader.readJsonc(spark, path, Some(requiredSchema)))

  // ── building blocks ──────────────────────────────────────────────────

  /** F12 — digital_assets with type=='image' → Image structs
    * (ref: midocean_transformer.py:304-316). */
  private def imagesOf(assets: Column): Column =
    transform(
      filter(coalesce(assets, array()), a => a.getField("type") === "image"),
      a => struct(
        coalesce(a.getField("url"), lit("")).as("url"),
        a.getField("subtype").as("type"),
        Parsers.snakeToTitle(a.getField("subtype")).as("description"),
        lit(null).cast("string").as("color_variant")))

  /** Full Price struct from a pricelist row (comma-decimal price,
    * GBP, tier 1..∞, unit price, optional valid_until —
    * ref: midocean_transformer.py:329-361). */
  private def priceStruct(price: Column, validUntil: Column): Column =
    struct(
      Parsers.parseFloatComma(price).as("value"),
      lit("GBP").as("currency"),
      lit(1).as("min_quantity"),
      lit(null).cast("int").as("max_quantity"),
      lit("unit").as("type"),
      lit(null).cast("string").as("description"),
      Parsers.parseIsoDate(validUntil).cast("timestamp").as("valid_until"))

  /** P7 — variant status with the 2099-12-31 sentinel
    * (ref: midocean_transformer.py:477-489). */
  private def variantStatus(v: Column): Column =
    Parsers.deriveStatus(v.getField("discontinued_date"), v.getField("plc_status_description"))

  // ── the transform ────────────────────────────────────────────────────

  /** Raw MidOcean feed → unified product DataFrame (rows conform to
    * graft.schema.Unified.schema minus the sink-stamped timestamps,
    * which stay null until the sink applies K7).
    *
    * `language` is the language the capture was fetched in (the
    * reference re-requests the whole feed per `language` parameter,
    * midocean_extractor.py:34,144): it keys this run's localized maps.
    * Merge per-language runs with
    * [[graft.operators.Localize.mergeLanguageRuns]] for full
    * multilingual maps (unified.jsonc:25-33). */
  def unified(feed: Feed): DataFrame = unified(feed, "en")

  def unified(feed: Feed, language: String): DataFrame = {
    val products = feed.products
    val pricelist = feed.pricelist

    // J1: explode variants (order-indexed), broadcast-join prices on sku.
    val v = products
      .select(col("master_code"),
        posexplode_outer(col("variants")).as(Seq("__pos", "v")))
    val prices = broadcast(pricelist.select(
      col("sku").as("__price_sku"),
      priceStruct(col("price"), col("valid_until")).as("__price")))
    val priced = v.join(prices, col("v.sku") === col("__price_sku"), "left_outer")

    val variantStruct = struct(
      coalesce(col("v.sku"), lit("")).as("sku"),
      col("v.variant_id").as("variant_id"),
      struct(
        coalesce(col("v.color_code"), lit("")).as("code"),
        coalesce(col("v.color_description"), lit("")).as("name"),
        lit(null).cast("string").as("hex_color"),
        col("v.pms_color").as("pms_color"),
        imagesOf(col("v.digital_assets")).as("images"),
        lit("active").as("status")).as("color"),
      lit(null).cast("string").as("size"),
      lit(null).cast("string").as("material_variant"),
      lit(null).cast(graft.schema.Unified.schema("dimensions").dataType).as("dimensions"),
      lit(null).cast(graft.schema.Unified.schema("weight").dataType).as("weight"),
      when(col("__price").isNotNull, array(col("__price")))
        .otherwise(array().cast("array<struct<value:double,currency:string,min_quantity:int,max_quantity:int,type:string,description:string,valid_until:timestamp>>"))
        .as("prices"),
      lit(null).cast(graft.schema.Unified.schema("variants").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]("stock").dataType).as("stock"),
      imagesOf(col("v.digital_assets")).as("images"),
      variantStatus(col("v")).as("status"),
      col("v.gtin").as("gtin"))

    // Re-nest preserving feed order (A5 depends on element 1).
    val variantsByProduct = priced
      .groupBy(col("master_code"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), variantStruct.as("v")))),
        x => x.getField("v")).as("__variants"))

    // J2: printdata products → print positions (left outer on master_code).
    val positions = feed.printdataProducts
      .select(col("master_code"),
        transform(col("printing_positions"), p => struct(
          coalesce(p.getField("position_id"), lit("")).as("id"),
          coalesce(p.getField("position_id"), lit("")).as("name"),
          p.getField("max_print_size_width").cast("double").as("max_width"),
          p.getField("max_print_size_height").cast("double").as("max_height"),
          lit(null).cast("double").as("max_area"),
          lit("mm").as("unit"),
          filter(transform(p.getField("printing_techniques"),
            t => element_at(techMapCol, t.getField("id"))), x => x.isNotNull)
            .as("techniques"),
          lit(null).cast("int").as("max_colors"),
          lit(null).cast("map<string,string>").as("coordinates"),
          transform(coalesce(p.getField("images"), array()), i => struct(
            coalesce(i.getField("print_position_image_with_area"), lit("")).as("url"),
            lit("print_position").as("type"),
            concat(lit("Print position: "),
              coalesce(p.getField("position_id"), lit(""))).as("description"),
            lit(null).cast("string").as("color_variant"))).as("images")))
          .as("__print_positions"))

    // J3/F14: global print techniques → print options, computed once.
    // (All-nullable literal type: schema-derived Price has NOT NULL
    // fields that a built struct can't cast into.)
    val fullPrice = "array<struct<value:double,currency:string,min_quantity:int,max_quantity:int,type:string,description:string,valid_until:timestamp>>"
    val scalePrices = flatten(transform(col("t.var_costs"), vc =>
      filter(
        transform(vc.getField("scales"), sc => struct(
          Parsers.parseFloatComma(sc.getField("price")).as("value"),
          lit("GBP").as("currency"),
          Parsers.parseIntSeparators(sc.getField("minimum_quantity")).as("min_quantity"),
          lit(null).cast("int").as("max_quantity"),
          lit("unit").as("type"),
          lit(null).cast("string").as("description"),
          lit(null).cast("timestamp").as("valid_until"))),
        // Python truthiness: zero or unparseable price/min-qty is skipped
        // (midocean_transformer.py:452).
        p => p.getField("value").isNotNull && p.getField("value") =!= 0.0 &&
          p.getField("min_quantity").isNotNull && p.getField("min_quantity") =!= 0)))
    // Localized technique display names: printdata's per-language
    // `{lang: name}` singleton lists (F19 merge) keyed by technique id
    // — a KB-scale dimension, broadcast onto the technique rows.
    val descs = feed.techniqueDescriptions
    val techNames = descs.select(col("id").as("__tech_id"),
      Parsers.structListToMap(descs, col("name")).as("__tech_names"))
    val optionRow = feed.printTechniques
      .join(broadcast(techNames), col("t.id") === col("__tech_id"), "left_outer")
      .select(col("__pos"),
        element_at(techMapCol, col("t.id")).as("technique"),
        Parsers.parseFloatComma(col("t.setup")).as("setup"),
        scalePrices.as("prices"), col("__tech_names"))
      .filter(col("technique").isNotNull)
      .select(struct(
        col("__pos"),
        struct(
          col("technique").as("technique"),
          lit("various").as("position"),
          lit(1).as("max_colors"),
          col("setup").as("setup_charge"),
          col("prices").cast(fullPrice).as("prices"),
          lit(null).cast("string").as("lead_time"),
          lit(false).as("is_default"),
          col("__tech_names").as("technique_names")).as("o")).as("po"))
      // Explicit __pos comparator: the option struct now carries a map
      // (technique_names), which default struct ordering can't compare.
      .agg(transform(
        array_sort(collect_list(col("po")), (l, r) =>
          when(l.getField("__pos") < r.getField("__pos"), -1)
            .when(l.getField("__pos") > r.getField("__pos"), 1).otherwise(0)),
        x => x.getField("o"))
        .as("__print_options"))

    // Assemble the unified row.
    val firstVariant = try_element_at(col("variants"), lit(1))
    val rawVariant1 = try_element_at(col("variants_raw"), lit(1))

    val base = products
      .withColumnRenamed("variants", "variants_raw")
      .join(variantsByProduct, Seq("master_code"), "left_outer")
      .withColumnRenamed("__variants", "variants")
      .join(broadcast(positions), Seq("master_code"), "left_outer")
      .crossJoin(broadcast(optionRow))

    val dims = {
      val l = Parsers.parseFloatComma(col("length"))
      val w = Parsers.parseFloatComma(col("width"))
      val h = Parsers.parseFloatComma(col("height"))
      when(coalesce(l, w, h).isNull, lit(null)).otherwise(struct(
        l.as("length"), w.as("width"), h.as("height"),
        lit(null).cast("double").as("diameter"),
        when(lower(coalesce(col("length_unit"), lit("cm"))) === "cm", "cm")
          .otherwise("mm").as("unit")))
    }
    val weight = {
      val value = coalesce(Parsers.parseFloatComma(col("gross_weight")),
        Parsers.parseFloatComma(col("net_weight")))
      when(value.isNull, lit(null)).otherwise(struct(
        value.as("value"),
        when(lower(coalesce(col("gross_weight_unit"), lit("kg"))) === "kg", "kg")
          .otherwise("g").as("unit")))
    }
    val categories = {
      val cat = (name: Column, level: Int) => struct(
        lit(null).cast("string").as("id"), name.as("name"),
        lit(level).as("level"), lit(null).cast("string").as("parent_id"))
      filter(array(
        cat(col("product_class"), 1),
        cat(rawVariant1.getField("category_level1"), 1),
        cat(rawVariant1.getField("category_level2"), 2),
        cat(rawVariant1.getField("category_level3"), 3)),
        c => c.getField("name").isNotNull)
    }

    base.select(
      concat(lit("midocean_"), coalesce(col("master_code"), lit(""))).as("product_id"),
      struct(
        lit(supplierId).as("id"), lit("MidOcean").as("name"),
        lit("2.0").as("api_version"),
        map(lit("website"), lit("https://www.midocean.com"),
          lit("api_base"), lit("https://api.midocean.com/gateway/")).as("contact_info"))
        .as("supplier"),
      coalesce(col("master_code"), lit("")).as("supplier_product_code"),
      coalesce(col("product_name"), lit("")).as("name"),
      lit(null).cast("string").as("title"),
      col("short_description"),
      col("long_description"),
      array().cast("array<string>").as("keywords"),
      categories.as("categories"),
      col("brand"),
      dims.as("dimensions"),
      weight.as("weight"),
      col("material"),
      array().cast("array<string>").as("colors_available"),
      coalesce(col("variants"), array().cast(graft.schema.Unified.schema("variants").dataType)).as("variants"),
      coalesce(slice(firstVariant.getField("prices"), 1, 1), array().cast(fullPrice)).as("base_prices"),
      (lower(coalesce(col("printable"), lit(""))) === "yes").as("is_printable"),
      coalesce(col("__print_positions"),
        array().cast(graft.schema.Unified.schema("print_positions").dataType)).as("print_positions"),
      coalesce(col("__print_options"),
        array().cast(graft.schema.Unified.schema("print_options").dataType)).as("print_options"),
      coalesce(firstVariant.getField("images"),
        array().cast(graft.schema.Unified.schema("images").dataType)).as("images"),
      array().cast("array<string>").as("artwork_templates"),
      lit(1).as("minimum_order_quantity"),
      Parsers.parseIntSeparators(col("outer_carton_quantity")).as("carton_quantity"),
      lit(null).cast("string").as("lead_time"),
      array().cast(graft.schema.Unified.schema("shipping_options").dataType).as("shipping_options"),
      col("country_of_origin"),
      col("commodity_code").as("tariff_code"),
      lit(null).cast("string").as("commodity_code"),
      lit("active").as("status"),
      // Carton packaging (ref unified.jsonc:136-161; feed units: carton
      // dims in m, weight kg — kept as-declared via the unit fields).
      struct(
        when(Parsers.parseIntSeparators(col("inner_carton_quantity")).isNotNull,
          struct(
            Parsers.parseIntSeparators(col("inner_carton_quantity")).as("qty"),
            lit(null).cast("double").as("length"),
            lit(null).cast("double").as("width"),
            lit(null).cast("double").as("height"),
            lit("cm").as("unit"),
            lit(null).cast("double").as("weight_net"),
            lit(null).cast("double").as("weight_gross"),
            lit("kg").as("weight_unit"),
            lit(null).cast("double").as("volume"),
            lit(null).cast("string").as("volume_unit"))).as("inner_carton"),
        when(coalesce(Parsers.parseIntSeparators(col("outer_carton_quantity")),
            Parsers.parseFloatComma(col("carton_length"))).isNotNull,
          struct(
            Parsers.parseIntSeparators(col("outer_carton_quantity")).as("qty"),
            Parsers.parseFloatComma(col("carton_length")).as("length"),
            Parsers.parseFloatComma(col("carton_width")).as("width"),
            Parsers.parseFloatComma(col("carton_height")).as("height"),
            coalesce(col("carton_length_unit"), lit("m")).as("unit"),
            lit(null).cast("double").as("weight_net"),
            Parsers.parseFloatComma(col("carton_gross_weight")).as("weight_gross"),
            coalesce(col("carton_gross_weight_unit"), lit("kg")).as("weight_unit"),
            Parsers.parseFloatComma(col("carton_volume")).as("volume"),
            col("carton_volume_unit").cast("string").as("volume_unit"))).as("outer_carton"),
        lit(null).cast("string").as("type"),
        lit(null).cast("string").as("type_item"))
        .cast(graft.schema.Unified.schema("packaging").dataType).as("packaging"),
      lit(null).cast(graft.schema.Unified.schema("sustainability").dataType)
        .as("sustainability"),
      // Lifecycle (ref unified.jsonc:14-22): feed carries type and a
      // per-product modification timestamp.
      struct(
        col("type_of_products").cast("string").as("type_of_product"),
        lit(null).cast("string").as("product_lifecycle"),
        lit(null).cast("timestamp").as("intro_date"),
        lit(null).cast("timestamp").as("release_date"),
        col("timestamp").try_cast("timestamp").as("modified_date"),
        lit(null).cast("timestamp").as("discontinued_date"))
        .cast(graft.schema.Unified.schema("lifecycle").dataType).as("lifecycle"),
      array().cast("array<string>").as("related_products"),
      array().cast("array<string>").as("alternative_products"),
      // Localized content maps (ref unified.jsonc:25-33 `{lang}`
      // convention): one capture is single-language, so each non-null
      // field fills this run's language key; per-language technique
      // names ride in print_options.technique_names, and full
      // multilingual product maps come from merging per-language runs
      // (Localize.mergeLanguageRuns).
      {
        val en = (c: Column) => when(c.isNotNull, map(lit(language), c))
        struct(
          en(col("brand")).as("brand"),
          en(col("product_name")).as("name"),
          lit(null).cast("map<string,string>").as("title"),
          en(col("short_description")).as("short_description"),
          en(col("long_description")).as("long_description"),
          lit(null).cast("map<string,string>").as("web_description"),
          lit(null).cast("map<string,string>").as("keywords"))
          .cast(graft.schema.Unified.schema("localized").dataType).as("localized")
      },
      // Open attribute map (ref unified.jsonc:86-122 productExtraData):
      // feed fields outside the core schema, stringified; null-valued
      // entries dropped.
      map_filter(map(
        lit("master_id"), col("master_id").cast("string"),
        lit("type_of_products"), col("type_of_products").cast("string"),
        lit("number_of_print_positions"), col("number_of_print_positions").cast("string"),
        lit("volume"), col("volume").cast("string"),
        lit("volume_unit"), col("volume_unit").cast("string"),
        lit("inner_carton_quantity"), col("inner_carton_quantity").cast("string")),
        (_, v) => v.isNotNull).as("product_extra_data"),
      lit(null).cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("updated_at"),
      lit(null).cast("timestamp").as("last_sync"),
      to_json(struct(products.columns.toSeq.map {
        case "variants" => col("variants_raw").as("variants")
        case c => col(c)
      }: _*)).as("raw_data"))
  }

  /** Convenience: read + transform in one call. */
  def unified(spark: SparkSession, path: String): DataFrame =
    unified(readFeed(spark, path))

  /** Read + transform a capture fetched in `language`. */
  def unified(spark: SparkSession, path: String, language: String): DataFrame =
    unified(readFeed(spark, path), language)
}
