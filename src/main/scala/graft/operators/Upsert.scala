package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-merge sink semantics (SURVEY §2.2 K1–K5) re-expressed for a
  * columnar store: MongoDB `ReplaceOne(upsert=true)` becomes
  * "union existing + incoming, keep the newest row per key" — the W3
  * window dedup (ref: mongodb_loader.py:93-197, 130-134).
  *
  * Scale notes: the window shuffles once on the key — the same cost an
  * upsert-capable table format (Delta/Iceberg MERGE) pays. The parquet
  * merge writes with dynamic partition overwrite so only partitions
  * touched by the incoming batch are rewritten — a 100 TB target with
  * per-supplier partitions rewrites one supplier's data, not the world.
  */
object Upsert {

  /** K1 — bulk keyed upsert: last writer wins per `keyCols`, ordered by
    * `orderBy` (descending priority first), then incoming-over-existing,
    * then a final deterministic tie-break on the key columns. */
  def merge(existing: DataFrame, incoming: DataFrame,
            keyCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val unioned = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderBy :+ col("__src").desc: _*)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
  }

  /** Single-key, version-column convenience (K1/K2). */
  def merge(existing: DataFrame, incoming: DataFrame,
            keyCol: String, versionCol: String): DataFrame =
    merge(existing, incoming, Seq(keyCol), Seq(col(versionCol).desc_nulls_last))

  /** K1 applied to a parquet table partitioned by `partitionCol` (e.g.
    * supplier id). Only partitions present in `incoming` are read,
    * merged, and overwritten (dynamic partition overwrite) — the rest
    * of the table is untouched, so merge cost is proportional to the
    * incoming batch, not the table. First write creates the table. */
  def mergeIntoParquet(spark: SparkSession, incoming: DataFrame, path: String,
                       keyCol: String, versionCol: String,
                       partitionCol: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Scope the read to ONLY the incoming batch's partition
    // DIRECTORIES (not a row-level semi filter over a whole-table
    // listing): in the thread-pooled sync a sibling supplier's dynamic
    // partition overwrite deletes the files it replaces concurrently,
    // so listing all partitions here can hit FileNotFoundException
    // between the listing and the checkpoint. A supplier never lists
    // sibling partitions' files this way. ignoreMissingFiles is a
    // second net for any straggler deletion inside our own dirs.
    // Spark writes BOTH null and empty-string partition values under
    // the __HIVE_DEFAULT_PARTITION__ directory — normalize both, or an
    // empty-string-keyed partition is never read back and the dynamic
    // overwrite destroys its existing rows.
    val wanted = incoming.select(col(partitionCol).cast("string")).distinct()
      .collect()
      .map(r => Option(r.getString(0)).filter(_.nonEmpty)
        .getOrElse("__HIVE_DEFAULT_PARTITION__"))
      .toSet
    val partDirs =
      if (!fs.exists(target)) Seq.empty
      else fs.listStatus(target).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
        .filter(d => wanted(graft.sinks.SnapshotStore.unescapePathName(
          d.getPath.getName.stripPrefix(s"$partitionCol="))))
    // Concurrent first-write race: another writer may have CREATED a
    // partition dir but not yet committed a parquet footer, so the dir
    // exists while the read finds no schema. That state is semantically
    // "no existing data for OUR partitions" — first-write path.
    val existingOpt =
      if (partDirs.isEmpty) None
      else try Some(spark.read
        .option("basePath", path)
        .option("ignoreMissingFiles", "true")
        .parquet(partDirs.map(_.getPath.toString): _*))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
      }
    val merged = existingOpt match {
      case Some(existing) =>
        // Staging keeps the read and the overwrite of the same
        // partitions from racing (first write has nothing to race).
        Checkpoints.truncate(merge(existing, incoming, keyCol, versionCol))
      case None => incoming
    }
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** K3 — keyed delete: remove rows whose key appears in `ids`.
    * The anti-join is deliberately UNHINTED: the id set is unbounded
    * (a bulk GDPR purge ships millions of keys), and a forced
    * broadcast would bypass AQE's size check and OOM the driver. AQE
    * broadcasts small id lists on its own; big ones shuffle — the
    * same rule [[GroupScope]] documents. */
  def deleteByKeys(target: DataFrame, ids: DataFrame, keyCol: String): DataFrame =
    target.join(ids.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** K4 — predicate delete (retention): keep rows NOT matching cond. */
  def deleteWhere(target: DataFrame, cond: Column): DataFrame =
    target.filter(!coalesce(cond, lit(false)))

  /** K5 — backup / CTAS snapshot. */
  def backup(df: DataFrame, backupPath: String): Unit =
    df.write.mode("overwrite").parquet(backupPath)

  /** K6 — uniqueness check replacing the reference's unique index:
    * returns the violating keys (empty = constraint holds). */
  def duplicateKeys(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** K7 — mutation timestamping before a write (per-batch, not per-row:
    * deterministic across retries). Ref: mongodb_loader.py:124,205. */
  def stamped(df: DataFrame, tsCol: String = "updated_at"): DataFrame =
    df.withColumn(tsCol, current_timestamp())

  /** Co-located-join layout: persist as a bucketed + sorted catalog
    * table. Two tables bucketed the same way join with NO shuffle on
    * either side — the 100 TB answer to repeated key-joins (variants ⋈
    * stock ⋈ prices on sku): pay the partitioning once at write time,
    * never again per query. (The index-replacement role of the
    * reference's MongoDB indexes — unified_product_schema.py:229-248.) */
  def writeBucketed(df: DataFrame, tableName: String, keyCol: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)
}
