package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Locale/format-tolerant scalar functions (SURVEY §2.7, F1–F19).
  *
  * All functions are null-safe and total (never throw — invalid input
  * yields null, mirroring the reference's skip-and-default semantics at
  * `etl/transformers/midocean_transformer.py:491-515`), and are composed
  * exclusively from codegen'd Spark built-ins — zero UDFs, so every one
  * of them stays inside whole-stage codegen and is pushdown-friendly.
  *
  * Reference citations are `file:line` into `/root/reference/`.
  */
object Parsers {

  /** F1 — None-safe float parse with comma decimal separator
    * ("3,63" → 3.63); garbage → null.
    * Ref: midocean_transformer.py:491-502. */
  def parseFloatComma(c: Column): Column =
    regexp_replace(c, ",", ".").try_cast("double")

  /** F2 — None-safe int parse stripping `.`/`,` thousands separators
    * ("1.000" → 1000); garbage → null.
    * Ref: midocean_transformer.py:504-515. */
  def parseIntSeparators(c: Column): Column =
    regexp_replace(c, "[.,]", "").try_cast("int")

  /** F3 — currency-symbol strip + "N/A" → null + cast
    * ("£0.42" → 0.42). Ref: Laltex Sample Data.jsonc:186-233,
    * unified.jsonc:394-396. */
  def parseCurrency(c: Column): Column =
    nullif(regexp_replace(c, "[£$€,]", ""), lit("N/A")).try_cast("double")

  /** F4 — ISO date parse (yyyy-MM-dd); invalid → null.
    * Ref: midocean_transformer.py:344-346. */
  def parseIsoDate(c: Column): Column = try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date")

  /** F6 — 'yes'/'no' flag → boolean. Ref: midocean_transformer.py:171. */
  def yesNoFlag(c: Column): Column = lower(c) === "yes"

  /** F7 — snake_case → Title Case ("back_side" → "Back Side").
    * Ref: midocean_transformer.py:313. */
  def snakeToTitle(c: Column): Column = initcap(translate(c, "_", " "))

  /** F8 — namespaced key concat ("midocean_" + master_code).
    * Ref: midocean_transformer.py:129-130. */
  def namespacedKey(prefix: String, c: Column): Column =
    concat(lit(prefix), c.cast("string"))

  /** F9 — code→canonical mapping kept as data (a lookup map), unknown
    * codes → null (caller drops). Ref: midocean_transformer.py:29-95. */
  def codeLookup(mapping: Map[String, String])(c: Column): Column = {
    val m = map(mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    element_at(m, c)
  }

  /** F10 — unit normalization helpers: preferred-over-fallback value.
    * Ref: midocean_transformer.py:190-231 (gross over net weight). */
  def preferred(primary: Column, fallback: Column): Column =
    coalesce(primary, fallback)

  /** F17 — dimension-string parse: "190x80x2mm", "42 x 37 x 55 cm",
    * "10,5X8X2 CM" → struct(length, width, height, unit).
    * Comma decimals tolerated (F1). Ref: Laltex Sample Data.jsonc:13,
    * unified.jsonc:125-135. */
  def parseDims(c: Column): Column = {
    val norm = regexp_replace(lower(c), ",", ".")
    val num = "([0-9]+(?:\\.[0-9]+)?)"
    val pat = s"^\\s*$num\\s*x\\s*$num\\s*x\\s*$num\\s*(mm|cm|m)?\\s*$$"
    struct(
      regexp_extract(norm, pat, 1).try_cast("double").as("length"),
      regexp_extract(norm, pat, 2).try_cast("double").as("width"),
      regexp_extract(norm, pat, 3).try_cast("double").as("height"),
      nullif(regexp_extract(norm, pat, 4), lit("")).as("unit"))
  }

  /** F17b — weight-string parse: "9.000 kg" → struct(value, unit). */
  def parseWeight(c: Column): Column = {
    val pat = "^\\s*([0-9]+(?:[.,][0-9]+)?)\\s*(kg|g|gr|lb|oz)?\\s*$"
    val norm = lower(c)
    struct(
      regexp_replace(regexp_extract(norm, pat, 1), ",", ".").try_cast("double").as("value"),
      nullif(regexp_extract(norm, pat, 2), lit("")).as("unit"))
  }

  /** F18 — comma-separated keyword list → trimmed array.
    * Ref: Laltex Sample Data.jsonc:11 → unified_product_schema.py:156. */
  def splitKeywords(c: Column): Column =
    filter(transform(split(c, ","), w => trim(w)), w => w =!= "")

  /** F19 — list of single-key maps → one map
    * ([{cs:…},{da:…}] → {cs:…, da:…}).
    * Ref: MidOcean Sample Data.jsonc:861-960. */
  def mergeSingletonMaps(c: Column): Column =
    map_from_entries(flatten(transform(c, m => map_entries(m))))

  /** F19 on the JSON-inferred shape: `[{"cs": …}, {"da": …}]` infers as
    * array<struct<every key seen>> with one non-null field per element,
    * not array<map>. Merge to a single key→value map, keyed by field
    * name, taking each field's first non-null value across elements.
    * Plan-time schema dispatch (needs `df` to resolve the element
    * struct); non-array/struct input → null map. */
  def structListToMap(df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    import org.apache.spark.sql.types._
    df.select(c.as("__x")).schema.head.dataType match {
      case ArrayType(st: StructType, _) =>
        val entries = st.fieldNames.toSeq.map { f =>
          struct(
            lit(f).as("key"),
            try_element_at(
              filter(transform(c, e => e.getField(f).cast("string")),
                v => v.isNotNull), lit(1)).as("value"))
        }
        map_from_entries(filter(array(entries: _*), e => e.getField("value").isNotNull))
      case _ => lit(null).cast("map<string,string>")
    }
  }

  /** P7 — product-status derivation with the 2099-12-31 "never
    * discontinued" sentinel. Ref: midocean_transformer.py:477-489. */
  def deriveStatus(discontinuedDate: Column, plcStatusDesc: Column): Column =
    when(discontinuedDate.isNotNull && discontinuedDate =!= "2099-12-31", "discontinued")
      .when(upper(coalesce(plcStatusDesc, lit(""))).contains("DISCONTINUED"), "discontinued")
      .otherwise("active")

  /** P9 — all-null-collapse: struct of measures becomes null when every
    * component is null. Ref: midocean_transformer.py:197-198. */
  def structOrNull(components: Seq[(String, Column)]): Column = {
    val any = coalesce(components.map(_._2): _*)
    when(any.isNull, lit(null)).otherwise(struct(components.map { case (n, col) => col.as(n) }: _*))
  }
}
