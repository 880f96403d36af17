package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flat child rows → ordered nested arrays (the pivot suppliers like
  * Ralawise/Sanmar need: per-SKU rows grouped up into a product with a
  * variant array — SURVEY §7.4 risk 5; MidOcean never needed it
  * because its feed arrives pre-nested).
  *
  * Scale: one hash-aggregate shuffle on the parent key — the minimum
  * possible for this reshape. Order inside the array is explicit
  * (`order` column), never partition-dependent.
  */
object Nest {

  /** Sort an array of `{o, v}` structs by `o` ONLY — required when `v`
    * contains non-orderable types (maps), where array_sort's default
    * whole-struct comparison fails analysis. */
  def sortByKey(arr: Column): Column =
    array_sort(arr, (a, b) =>
      when(a.getField("o") < b.getField("o"), -1)
        .when(a.getField("o") > b.getField("o"), 1)
        .otherwise(0))

  /** Group `df` by `keyCols`, collecting `value` per row into an array
    * sorted by `order`. Result: keyCols + `as` array column. */
  def rollup(df: DataFrame, keyCols: Seq[String], value: Column,
             order: Column, as: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(order.as("o"), value.as("v")))),
        x => x.getField("v")).as(as))

  /** Rollup plus "first row wins" for the remaining parent-level
    * columns (deterministic: first by `order`). */
  def rollupWithParent(df: DataFrame, keyCols: Seq[String],
                       parentCols: Seq[String], value: Column,
                       order: Column, as: String): DataFrame = {
    val parentStruct = struct(parentCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min_by(parentStruct, order).as("__parent"),
        transform(
          array_sort(collect_list(struct(order.as("o"), value.as("v")))),
          x => x.getField("v")).as(as))
      .select((keyCols.map(col) ++
        parentCols.map(c => col(s"__parent.`$c`").as(c)) :+ col(as)): _*)
  }

  /** Derived decoration summaries (ref unified.jsonc:266-270:
    * `numberOfPrintPositions`, `allAvailableMethods`,
    * `allAvailablePositions` — comma-separated rollups the reference
    * materializes on the document). Sorted-distinct so the strings are
    * canonical regardless of feed order. Map-side projection over the
    * existing arrays — no shuffle, no join. */
  def withPrintSummary(unified: DataFrame): DataFrame =
    unified
      .withColumn("number_of_print_positions", size(col("print_positions")))
      .withColumn("all_available_methods",
        concat_ws(", ", array_sort(array_distinct(
          transform(col("print_options"), o => o.getField("technique"))))))
      .withColumn("all_available_positions",
        concat_ws(", ", array_sort(array_distinct(
          transform(col("print_positions"), p => p.getField("name"))))))

  /** The inverse reshape: the unified table (product rows with a
    * variants array) → the unified.jsonc DOCUMENT shape, one row per
    * variant with product context (the extension schema is
    * variant-level — sourceProductCode/variantCode/sku/gtin sit at top
    * level there, ref unified.jsonc:4-12 — so per-variant consumers of
    * the reference read exactly this). Products with no variants still
    * yield one row with null variant fields (explode_outer). Map-side:
    * a generator plus projection, no shuffle. */
  def variantView(unified: DataFrame): DataFrame =
    unified
      .select(col("*"), explode_outer(col("variants")).as("__v"))
      .select(
        col("product_id").as("parent_product_id"),
        col("supplier.id").as("supplier"),
        col("name"),
        col("status"),
        col("is_printable"),
        col("__v.sku").as("sku"),
        col("__v.variant_id").as("variant_id"),
        col("__v.gtin").as("gtin"),
        col("__v.size").as("size"),
        col("__v.color.name").as("color"),
        col("__v.stock.available").as("stock_available"),
        size(coalesce(col("__v.prices"),
          array().cast(graft.schema.Unified.variantSchema("prices").dataType)))
          .as("n_prices"),
        col("__v.dimensions").as("dimensions"),
        col("__v.weight").as("weight"))
}
