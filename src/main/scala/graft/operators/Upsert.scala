package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-merge sink semantics (SURVEY §2.2 K1–K5) re-expressed for a
  * columnar store: MongoDB `ReplaceOne(upsert=true)` becomes
  * "union existing + incoming, keep the newest row per key" — the W3
  * window dedup (ref: mongodb_loader.py:93-197, 130-134).
  *
  * Scale notes: the window shuffles once on the key — the same cost an
  * upsert-capable table format (Delta/Iceberg MERGE) pays. Writes are
  * partitioned by a caller-chosen column (e.g. supplier id) so 100 TB
  * targets prune to the touched partitions.
  */
object Upsert {

  /** K1 — bulk keyed upsert: last writer (by `versionCol`, then
    * deterministic tie-break on key) wins per `keyCol`. */
  def merge(existing: DataFrame, incoming: DataFrame,
            keyCol: String, versionCol: String): DataFrame = {
    val unioned = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
  }

  /** K1 applied to a parquet path (read-merge-overwrite). */
  def mergeIntoParquet(spark: SparkSession, incoming: DataFrame,
                       path: String, keyCol: String, versionCol: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(target)) merge(spark.read.parquet(path), incoming, keyCol, versionCol)
      else incoming
    // Stage to a temp dir then swap: the source partitions of an
    // overwrite cannot also be its input.
    val tmp = path + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
  }

  /** K3 — keyed delete: remove rows whose key appears in `ids`. */
  def deleteByKeys(target: DataFrame, ids: DataFrame, keyCol: String): DataFrame =
    target.join(broadcast(ids.select(keyCol).distinct()), Seq(keyCol), "left_anti")

  /** K4 — predicate delete (retention): keep rows NOT matching cond. */
  def deleteWhere(target: DataFrame, cond: org.apache.spark.sql.Column): DataFrame =
    target.filter(!coalesce(cond, lit(false)))

  /** K6 — uniqueness check replacing the reference's unique index:
    * returns the violating keys (empty = constraint holds). */
  def duplicateKeys(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).filter(col("n") > 1)
}
