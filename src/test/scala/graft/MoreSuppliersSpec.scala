package graft

import org.apache.spark.sql.functions._

class KeramikosSpec extends SparkSpec {
  import graft.suppliers.Keramikos

  private val samplePath = "/root/reference/sample data/Keramikos Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = Keramikos.unified(spark, samplePath); df.cache(); df }

  test("products parse with spec-derived weight/dims and category") {
    assume(available)
    val r = unified.filter(col("product_id") === "keramikos_ATLWHI")
      .select(col("name"), col("brand"), col("weight.value"), col("weight.unit"),
        col("carton_quantity"), element_at(col("categories"), 1).getField("name"),
        col("status")).collect()(0)
    assert(r.getString(0) == "Atlantic White")
    assert(r.getString(1) == "Keramikos")
    assert(r.getDouble(2) == 275.0 && r.getString(3) == "g")
    assert(r.getInt(4) == 36)
    assert(r.getString(5) == "Earthenware")
    assert(r.getString(6) == "active")
  }

  test("boolean print flags become techniques; is_printable derived") {
    assume(available)
    val r = unified.filter(col("product_id") === "keramikos_ATLWHI")
      .select(col("is_printable"),
        transform(col("print_options"), o => o.getField("technique"))).collect()(0)
    assert(r.getBoolean(0))
    val techs = r.getSeq[String](1)
    assert(techs.contains("screen_print") && techs.contains("transfer") &&
      techs.contains("digital_print") && !techs.contains("sublimation"))
  }

  test("J6 grid: digital print option carries qty-tier prices with colour counts") {
    assume(available)
    val prices = unified.filter(col("product_id") === "keramikos_ATLWHI")
      .select(explode(col("print_options")).as("o"))
      .filter(col("o.technique") === "digital_print")
      .select(explode(col("o.prices")).as("p"))
      .select(col("p.min_quantity"), col("p.value"), col("p.description"))
      .orderBy(col("min_quantity")).collect()
    assert(prices.nonEmpty)
    assert(prices.head.getInt(0) == 36 && prices.head.getDouble(1) == 4.83)
    assert(prices.head.getString(2) == "colours=4")
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("keramikos: raw_data present and parseable") {
    if (available) assertRawData(unified, "keramikos")
  }
}

class PreseliSpec extends SparkSpec {
  import graft.suppliers.Preseli

  private val samplePath = "/root/reference/sample data/Preseli Sample Data.jsonc"
  private def available = new java.io.File(samplePath).exists()

  private lazy val unified = { val df = Preseli.unified(spark, samplePath); df.cache(); df }

  test("single-product response parses with dims/weight/colours/images") {
    assume(available)
    val r = unified.filter(col("product_id") === "preseli_PSL10")
      .select(col("name"), col("dimensions.width"), col("dimensions.unit"),
        col("weight.value"), col("weight.unit"), size(col("images")),
        col("colors_available"), col("material")).collect()(0)
    assert(r.getString(0) == "10mm Plant Silk Lanyard")
    assert(r.getDouble(1) == 370.0 && r.getString(2) == "mm")
    assert(r.getDouble(3) == 10.0 && r.getString(4) == "g")
    assert(r.getInt(5) == 4)
    assert(r.getSeq[String](6).contains("off-white"))
    assert(r.getString(7) == "plant silk")
  }

  test("J5 technique-keyed quantity tiers: Type=Product rows become unit prices") {
    assume(available)
    val tiers = unified.filter(col("product_id") === "preseli_PSL10")
      .select(explode(col("base_prices")).as("p"))
      .select(col("p.min_quantity"), col("p.value"), col("p.description"))
      .orderBy(col("min_quantity")).collect()
    assert(tiers.nonEmpty)
    assert(tiers.head.getInt(0) == 100 && tiers.head.getDouble(1) == 0.8)
    assert(tiers.head.getString(2) == "Screen")
  }

  test("print options map technique names; additional charge becomes setup") {
    assume(available)
    val opts = unified.filter(col("product_id") === "preseli_PSL10")
      .select(explode(col("print_options")).as("o"))
      .select(col("o.technique"), col("o.setup_charge")).collect()
    assert(opts.nonEmpty && opts.forall(_.getString(0) == "screen_print"))
    assert(opts.exists(!_.isNullAt(1)))
  }

  test("unified output conforms to the canonical schema") {
    assume(available)
    val out = unified.to(graft.schema.Unified.schema)
    assert(out.schema.catalogString == graft.schema.Unified.schema.catalogString)
    assert(out.count() > 0)
  }

  test("preseli: raw_data present and parseable") {
    if (available) assertRawData(unified, "preseli")
  }
}
