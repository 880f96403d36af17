package graft

import org.apache.spark.sql.functions._

/** The unified.jsonc schema extension: `{lang: string}` content maps,
  * `productExtraData`, and per-language technique names (ref:
  * /root/reference/unified.jsonc:25-33,86-122). Per-supplier raw_data
  * parity is asserted in each supplier's golden spec
  * (`assertRawData`). One cached MidOcean frame serves all tests.
  */
class LocalizedRawDataSpec extends SparkSpec {

  private val samplePath = "/root/reference/sample data/MidOcean Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()
  private lazy val unified = {
    val df = graft.suppliers.MidOcean.unified(spark, samplePath)
      .filter(col("product_id") === "midocean_AR1249")
    df.cache(); df
  }

  test("MidOcean: localized maps carry the single-language feed under 'en'") {
    assume(available)
    val r = unified.select(
      element_at(col("localized.name"), "en"),
      col("name"),
      element_at(col("localized.short_description"), "en"),
      element_at(col("product_extra_data"), "master_id"),
      element_at(col("product_extra_data"), "type_of_products")).collect()(0)
    assert(r.getString(0) == r.getString(1)) // localized name == name
    assert(r.getString(2) == "Target nautical compass")
    assert(r.getString(3) == "40000011")
    assert(r.getString(4) == "stock")
  }

  test("MidOcean: print options carry per-language technique names (F19 wiring)") {
    assume(available)
    // First option is technique id "B" (debossing) — printdata's name
    // list carries 15 languages (MidOcean Sample Data.jsonc:861-920).
    val first = try_element_at(col("print_options"), lit(1))
      .getField("technique_names")
    val r = unified.select(
      element_at(first, "en"), element_at(first, "de"),
      element_at(first, "fr"), size(map_keys(first))).collect()(0)
    assert(r.getString(0) == "Debossing")
    assert(r.getString(1) == "Prägung")
    assert(r.getString(2) == "Embossage")
    assert(r.getInt(3) == 15)
  }

  test("X1: mergeLanguageRuns unions per-language runs into full localized maps") {
    assume(available)
    // One capture stands in for each language's fetch (the reference
    // re-requests the feed per `language`, midocean_extractor.py:144).
    val runs = Seq("en", "de", "fr").map(l =>
      l -> graft.suppliers.MidOcean.unified(spark, samplePath, l))
    val merged = graft.operators.Localize.mergeLanguageRuns(runs)
      .filter(col("product_id") === "midocean_AR1249")
    val r = merged.select(
      map_keys(col("localized.name")),
      map_keys(col("localized.brand")),
      map_keys(col("localized.short_description")),
      map_keys(col("localized.long_description")),
      col("localized.title").isNull,
      element_at(col("localized.name"), "de"),
      col("name"),
      size(col("variants"))).collect()(0)
    // Sorted language keys on every populated field; unlocalized
    // fields stay null; base columns survive the merge intact.
    assert(r.getSeq[String](0) == Seq("de", "en", "fr"))
    assert(r.getSeq[String](1) == Seq("de", "en", "fr"))
    assert(r.getSeq[String](2) == Seq("de", "en", "fr"))
    assert(r.getSeq[String](3) == Seq("de", "en", "fr"))
    assert(r.getBoolean(4))
    assert(r.getString(5) == "TARGET")
    assert(r.getString(6) == "TARGET")
    assert(r.getInt(7) == 1)
  }

  test("X1: base columns come from the first-listed (preferred) run") {
    assume(available)
    val en = graft.suppliers.MidOcean.unified(spark, samplePath, "en")
      .withColumn("name", lit("EN-RUN"))
    val de = graft.suppliers.MidOcean.unified(spark, samplePath, "de")
      .withColumn("name", lit("DE-RUN"))
    val merged = graft.operators.Localize.mergeLanguageRuns(
      Seq("de" -> de, "en" -> en))
      .filter(col("product_id") === "midocean_AR1249")
    assert(merged.select(col("name")).collect()(0).getString(0) == "DE-RUN")
  }

  test("X1: products absent from the preferred run survive from a secondary run") {
    assume(available)
    val en = graft.suppliers.MidOcean.unified(spark, samplePath, "en")
      .filter(col("product_id") =!= "midocean_AR1804")
    val de = graft.suppliers.MidOcean.unified(spark, samplePath, "de")
    val merged = graft.operators.Localize.mergeLanguageRuns(
      Seq("en" -> en, "de" -> de))
    val r = merged.filter(col("product_id") === "midocean_AR1804")
      .select(map_keys(col("localized.name")), col("name")).collect()
    assert(r.length == 1)
    // Only the de run saw it, so only its key is present.
    assert(r(0).getSeq[String](0) == Seq("de"))
    assert(r(0).getString(1) == "ARCONOT")
  }

  test("X1: XD localized maps key by the feed's language variant") {
    val xdSample = "/root/reference/sample data/XD Sample Data.jsonc"
    assume(new java.io.File(xdSample).exists())
    val nl = graft.suppliers.Xd.unified(spark, xdSample, "nl")
    val r = nl.select(
      element_at(col("localized.name"), "nl"),
      element_at(col("localized.brand"), "nl"),
      map_keys(col("localized.long_description")),
      col("localized.short_description").isNull).collect()(0)
    assert(r.getString(0) == "VINGA Cott RCS RPET water bottle")
    assert(r.getString(1) == "Vinga")
    assert(r.getSeq[String](2) == Seq("nl"))
    assert(r.getBoolean(3))
  }
}
