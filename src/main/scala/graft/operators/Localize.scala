package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** X1 — full multilingual content maps (ref: unified.jsonc:25-33, the
  * `{lang: string}` convention on brand/name/title/descriptions/
  * keywords).
  *
  * The reference fetches each supplier feed once PER LANGUAGE (the
  * extractor's `language` request parameter, midocean_extractor.py:34,
  * 144; XD's per-language feed URLs `Xindao.V5.Products-en-gb`, XD
  * Sample Data.jsonc:3) and the unified document accumulates one map
  * key per fetched language. Re-expressed Spark-first: each supplier
  * transform takes a `language` parameter and keys its localized maps
  * with it; [[mergeLanguageRuns]] then merges the per-language unified
  * frames into one frame whose localized maps carry every language.
  *
  * Scale shape: a single hash-aggregate shuffle on the product key —
  * no joins, no per-language join chain (N languages as N-1 self-joins
  * would shuffle the catalog N-1 times; the union+groupBy shuffles it
  * once). Map-side partial aggregation applies because collect_list's
  * partial buffers are per-key and products are unique per feed row.
  */
object Localize {

  /** Merge per-language unified runs into one frame with full
    * localized maps.
    *
    * `runs` are (language, unified frame) pairs, highest-priority
    * language FIRST: every non-localized column (name, descriptions,
    * variants, raw_data, …) is taken from the first-listed language's
    * row for each product (`min_by` on the priority index —
    * deterministic because priorities are distinct per language).
    * Localized maps union entries across runs, sorted by language key
    * so output is replayable. A language key supplied by two runs is a
    * caller error and fails (Spark's default map-key dedup policy).
    *
    * Products absent from the preferred run but present in another
    * survive with that run's base columns (the groupBy is over the
    * union, not a join against the preferred frame). */
  def mergeLanguageRuns(runs: Seq[(String, DataFrame)],
                        keyCol: String = "product_id"): DataFrame = {
    require(runs.nonEmpty, "mergeLanguageRuns needs at least one run")
    require(runs.map(_._1).distinct.size == runs.size,
      s"duplicate language in ${runs.map(_._1)}")
    val tagged = runs.zipWithIndex.map { case ((_, df), i) =>
      df.withColumn("__lang_prio", lit(i))
    }
    val u = tagged.reduce(_.unionByName(_))
    // Nullable-ified target: merged maps are conditional (null when no
    // run localized the field), so a source schema with NOT NULL map
    // fields must relax or the output cast fails analysis.
    val locType = StructType(
      u.schema("localized").dataType.asInstanceOf[StructType]
        .fields.map(_.copy(nullable = true)))
    val fields = locType.fieldNames.toSeq

    val baseCols = u.columns.filterNot(_ == "__lang_prio").toSeq
    val baseStruct = struct(baseCols.map(col): _*)
    // One agg per localized field: flatten every run's (lang → text)
    // entries, sort by language for deterministic key order. null maps
    // (field not localized in that run) drop out via collect_list's
    // null-skipping.
    val aggs =
      min_by(baseStruct, col("__lang_prio")).as("__base") +:
        fields.map { f =>
          sort_array(flatten(collect_list(
            map_entries(col("localized").getField(f))))).as(s"__loc_$f")
        }
    val merged = u.groupBy(col(keyCol).as("__key"))
      .agg(aggs.head, aggs.tail: _*)

    def mergedMap(f: String): Column =
      when(size(col(s"__loc_$f")) > 0, map_from_entries(col(s"__loc_$f")))

    merged.select(baseCols.map {
      case "localized" =>
        struct(fields.map(f => mergedMap(f).as(f)): _*)
          .cast(locType).as("localized")
      case c => col("__base").getField(c).as(c)
    }: _*)
  }
}
