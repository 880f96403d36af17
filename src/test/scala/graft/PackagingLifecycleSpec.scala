package graft

import org.apache.spark.sql.functions._

/** unified.jsonc packaging / sustainabilityInfo / lifecycle sections
  * (ref: /root/reference/unified.jsonc:14-22,136-161,188-231), wired
  * from the feeds that actually carry the data: XD (outer carton,
  * eco/CO2/audits, ProductLifeCycle/IntroDate — XD Sample
  * Data.jsonc:10-66) and MidOcean (carton dims in m, volume, feed
  * timestamp — MidOcean Sample Data.jsonc:28-41).
  */
class PackagingLifecycleSpec extends SparkSpec {

  private val refDir = "/root/reference/sample data"
  private def ifSample(p: String)(body: => Unit): Unit =
    if (new java.io.File(p).exists()) body else cancel(s"sample not present: $p")

  test("XD: outer carton, sustainability, and lifecycle land in the unified row") {
    ifSample(s"$refDir/XD Sample Data.jsonc") {
      val u = graft.suppliers.Xd.unified(spark, s"$refDir/XD Sample Data.jsonc")
        .filter(col("product_id") === "xd_V10200")
      val r = u.select(
        col("packaging.outer_carton.qty"),
        col("packaging.outer_carton.length"),
        col("packaging.outer_carton.weight_gross"),
        col("packaging.type_item"),
        col("sustainability.eco"),
        col("sustainability.recycled_content_pct"),
        col("sustainability.co2_total"),
        size(col("sustainability.social_audits")),
        size(col("sustainability.certificates")),
        col("lifecycle.product_lifecycle"),
        date_format(col("lifecycle.intro_date"), "yyyy-MM-dd")).collect()(0)
      assert(r.getInt(0) == 48)
      assert(r.getDouble(1) == 41.5)
      assert(r.getDouble(2) == 7.3)
      assert(r.getString(3) == "Polybag and bulk")
      assert(r.getBoolean(4))
      assert(r.getDouble(5) == 98.0)
      assert(r.getDouble(6) == 0.43)
      assert(r.getInt(7) == 2)  // SMETA, BSCI
      assert(r.getInt(8) == 2)  // two certificate URLs
      assert(r.getString(9) == "Outlet")
      assert(r.getString(10) == "2022-12-30")
      // Feed images: MainImage → "main", AllImages CSV minus the main
      // URL → "gallery" (XD Sample Data.jsonc:67-71).
      val imgs = u.select(transform(col("images"),
        i => i.getField("type"))).collect()(0).getSeq[String](0)
      assert(imgs == Seq("main", "gallery", "gallery", "gallery"), imgs)
      val x = u.select(
        element_at(col("product_extra_data"), "giftWrappingPossible"),
        element_at(col("product_extra_data"), "variableDataPrinting")).collect()(0)
      assert(x.getString(0) == "true" && x.getString(1) == "true")
    }
  }

  test("PFConcept: size grid / range / gender land in extra data") {
    ifSample(s"$refDir/PFConcept Sample Data.jsonc") {
      val u = graft.suppliers.PfConcept
        .unified(spark, s"$refDir/PFConcept Sample Data.jsonc")
        .filter(col("product_id") === "pfconcept_R1070")
      val r = u.select(
        element_at(col("product_extra_data"), "sizeGrid"),
        element_at(col("product_extra_data"), "sizeRange"),
        element_at(col("product_extra_data"), "gender")).collect()(0)
      assert(r.getString(0) == "XS,S,M,L,XL,2XL,3XL")
      assert(r.getString(1) == "XS-3XL")
      assert(r.getString(2) == "Unisex")
    }
  }

  test("Keramikos: shapeName lands in extra data") {
    ifSample(s"$refDir/Keramikos Sample Data.jsonc") {
      val u = graft.suppliers.Keramikos
        .unified(spark, s"$refDir/Keramikos Sample Data.jsonc")
        .filter(col("product_id") === "keramikos_ATLWHI")
      val r = u.select(
        element_at(col("product_extra_data"), "shapeName")).collect()(0)
      assert(r.getString(0) == "Atlantic")
    }
  }

  test("Preseli: dataSheet and lead time land in extra data / lead_time") {
    ifSample(s"$refDir/Preseli Sample Data.jsonc") {
      val u = graft.suppliers.Preseli
        .unified(spark, s"$refDir/Preseli Sample Data.jsonc")
        .filter(col("product_id") === "preseli_PSL10")
      val r = u.select(col("lead_time"),
        element_at(col("product_extra_data"), "dataSheet"),
        element_at(col("product_extra_data"), "endUserWebsite")).collect()(0)
      assert(r.getString(0) == "15 working days")
      assert(r.getString(1).contains("datasheet.php"))
      assert(r.getString(2).contains("promobestsellers"))
    }
  }

  test("Laltex: carton dims/weight strings parse into packaging") {
    ifSample(s"$refDir/Laltex Sample Data.jsonc") {
      val u = graft.suppliers.Laltex
        .unified(spark, s"$refDir/Laltex Sample Data.jsonc")
        .filter(col("product_id") === "laltex_AA0131")
      val r = u.select(
        col("packaging.outer_carton.qty"),
        col("packaging.outer_carton.length"),
        col("packaging.outer_carton.height"),
        col("packaging.outer_carton.unit"),
        col("packaging.outer_carton.weight_gross"),
        col("packaging.outer_carton.weight_unit")).collect()(0)
      assert(r.getInt(0) == 1000)
      assert(r.getDouble(1) == 42.0)
      assert(r.getDouble(2) == 55.0)
      assert(r.getString(3) == "cm")
      assert(r.getDouble(4) == 9.0)
      assert(r.getString(5) == "kg")
    }
  }

  test("MidOcean: carton packaging and lifecycle timestamp land in the unified row") {
    ifSample(s"$refDir/MidOcean Sample Data.jsonc") {
      val u = graft.suppliers.MidOcean
        .unified(spark, s"$refDir/MidOcean Sample Data.jsonc")
        .filter(col("product_id") === "midocean_AR1249")
      val r = u.select(
        col("packaging.outer_carton.qty"),
        col("packaging.outer_carton.length"),
        col("packaging.outer_carton.unit"),
        col("packaging.outer_carton.weight_gross"),
        col("packaging.inner_carton.qty"),
        col("lifecycle.type_of_product"),
        date_format(col("lifecycle.modified_date"), "yyyy-MM-dd")).collect()(0)
      assert(r.getInt(0) == 80)
      assert(r.getDouble(1) == 0.57)
      assert(r.getString(2) == "m")
      assert(r.getDouble(3) == 10.96)
      assert(r.getInt(4) == 10)
      assert(r.getString(5) == "stock")
      assert(r.getString(6) == "2025-03-07")
    }
  }
}
