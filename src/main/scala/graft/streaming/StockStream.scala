package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming stock refresher (SURVEY §2.10): the natural
  * streaming input in the reference's data — MidOcean stock rows with
  * modified_at, Laltex DueIns ETAs (ref: MidOcean Sample
  * Data.jsonc:13194-13250, Laltex Sample Data.jsonc:4628-4636).
  *
  * Semantics: tumbling "latest per key" — exactly the reference's
  * upsert sink applied continuously. No session/sliding windows are
  * implied by the reference.
  *
  * Scale: state is one row per sku (keyed state store, RocksDB-backed
  * on a real cluster); the watermark bounds it — updates older than
  * the watermark are dropped instead of resurrecting dead keys.
  */
object StockStream {

  case class StockUpdate(sku: String, qty: Int, modified_at: Timestamp)
  case class StockState(sku: String, qty: Int, modified_at: Timestamp)

  /** Latest-update-per-sku with event-time semantics: later
    * modified_at wins regardless of arrival order. */
  def latestPerSku(updates: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .withWatermark("modified_at", watermarkDelay)
      .dropDuplicates("sku", "modified_at")
      .as[StockUpdate]
      .groupByKey(_.sku)
      .mapGroupsWithState[StockState, StockState](GroupStateTimeout.NoTimeout) {
        (sku, rows, state: GroupState[StockState]) =>
          val newest = (rows ++ state.getOption.map(s => StockUpdate(s.sku, s.qty, s.modified_at)))
            .maxBy(_.modified_at.getTime)
          val next = StockState(sku, newest.qty, newest.modified_at)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Batch-mode equivalent of [[latestPerSku]] for reconciliation and
    * backfill: one hash-aggregate max_by over the full update history
    * yields the same later-modified_at-wins state the stream holds
    * (tie-break on qty for a deterministic fold). Columns: sku, qty,
    * modified_at (qty type preserved). */
  def latestPerSkuBatch(updates: DataFrame): DataFrame =
    updates.groupBy(col("sku"))
      .agg(max_by(struct(col("qty"), col("modified_at")),
        struct(col("modified_at"), col("qty"))).as("__s"))
      .select(col("sku"), col("__s.qty").as("qty"),
        col("__s.modified_at").as("modified_at"))

  /** Sink: continuous upsert of the latest stock rows into a keyed
    * parquet table via the batch merge (K1) — the streaming analog of
    * the reference's ReplaceOne loop, one merge per micro-batch. */
  def writer(latest: DataFrame, tablePath: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    latest.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Upsert.mergeIntoParquet(
          batch.sparkSession, batch.withColumn("part", lit("stock")),
          tablePath, keyCol = "sku", versionCol = "modified_at", partitionCol = "part")
      }

  /** Sink variant into the ATOMIC snapshot store: one crash-safe
    * manifest commit per micro-batch (readers never see a torn
    * partition, time travel spans micro-batches, and every commit
    * records file-skipping stats). The checkpoint makes delivery
    * effectively-once: a replayed micro-batch re-merges the same rows,
    * which the keyed later-version-wins merge absorbs idempotently. */
  def snapshotWriter(latest: DataFrame, root: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    latest.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.sinks.SnapshotStore.mergeCommit(
            batch.sparkSession, batch.withColumn("part", lit("stock")),
            root, keys = "sku", versionCol = "modified_at", partitionCols = "part")
          ()
        }
      }

  /** File-source entry point: watch a directory of JSON-lines stock
    * updates (schema: sku STRING, qty INT, modified_at TIMESTAMP). */
  def fromJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("sku STRING, qty INT, modified_at TIMESTAMP")
      .json(dir)

  case class StockAlert(sku: String, qty: Int, threshold: Int,
                        kind: String, modified_at: Timestamp)

  /** Low-stock alerting via flatMapGroupsWithState: emits a row ONLY
    * when a sku crosses the threshold (below → "low_stock", back above
    * → "restocked") — variable output cardinality per group per batch
    * is exactly what flatMap-with-state exists for. State per sku is
    * one (qty, modified_at) pair; out-of-order events older than the
    * held state are ignored. */
  def lowStockAlerts(updates: DataFrame, threshold: Int,
                     watermarkDelay: String = "1 hour"): DataFrame = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .withWatermark("modified_at", watermarkDelay)
      .dropDuplicates("sku", "modified_at")
      .as[StockUpdate]
      .groupByKey(_.sku)
      .flatMapGroupsWithState[StockState, StockAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sku, rows, state: GroupState[StockState]) =>
          val sorted = rows.toSeq.sortBy(_.modified_at.getTime)
          var cur = state.getOption
          val alerts = scala.collection.mutable.ArrayBuffer.empty[StockAlert]
          sorted.foreach { u =>
            val newerThanState = cur.forall(_.modified_at.getTime < u.modified_at.getTime)
            if (newerThanState) {
              val wasLow = cur.exists(_.qty < threshold)
              val isLow = u.qty < threshold
              if (isLow && !wasLow)
                alerts += StockAlert(sku, u.qty, threshold, "low_stock", u.modified_at)
              else if (!isLow && wasLow)
                alerts += StockAlert(sku, u.qty, threshold, "restocked", u.modified_at)
              cur = Some(StockState(sku, u.qty, u.modified_at))
            }
          }
          cur.foreach(state.update)
          alerts.iterator
      }
      .toDF()
  }
}
