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
}
