package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.streaming.Sink

import graft.sinks.SnapshotStore

/** Structured-streaming sink for snapshot tables — the Delta
  * streaming-sink analog, reached as
  * `df.writeStream.format("graft-snapshot")`:
  *
  * {{{
  *   latest.writeStream.format("graft-snapshot")
  *     .outputMode("update")
  *     .option("key", "sku")
  *     .option("versionCol", "modified_at")
  *     .option("partitionCol", "part")
  *     .option("checkpointLocation", ckpt)
  *     .start(root)
  * }}}
  *
  * Every micro-batch lands as ONE atomic keyed-merge commit
  * ([[SnapshotStore.mergeCommit]]) — the same semantics
  * `StockStream.snapshotWriter` builds by hand with `foreachBatch`
  * (q103/q133), now a format surface so streaming users need no
  * custom writer code. Readers never see a torn partition; time
  * travel spans micro-batches.
  *
  * Exactly-once: the engine's checkpoint replays the LAST batch after
  * a restart, so `addBatch` records committed batch ids as marker
  * files under `root/_stream_commits/` and turns a re-delivered batch
  * into a true no-op (no new version, not even a content-identical
  * one). The marker is written AFTER the commit; a crash inside that
  * window re-merges the batch once, which the keyed
  * later-version-wins merge absorbs idempotently — effectively-once
  * content, at-most-one duplicate version, never data loss or
  * duplication. (This mirrors Delta's txn-version dedup, with the
  * version log externalized to marker files.)
  *
  * V1 `Sink`, matching [[ChangeFeedSource]]'s V1 choice on the read
  * side: `addBatch` re-leafs the micro-batch plan as a `LogicalRDD`
  * (the supported pattern for running further distributed jobs — the
  * merge's window + write — over a batch the engine handed us) and
  * persists it, because the merge protocol traverses the batch more
  * than once (touched-partition probe, merge, write). */
class GraftSnapshotSink(
    sqlContext: SQLContext,
    root: String,
    key: String,
    versionCol: String,
    partitionCol: String) extends Sink {

  private val spark = sqlContext.sparkSession.asInstanceOf[ClassicSession]

  /** Markers key on (query id, batch id) — Delta's (appId, txn
    * version) — NOT batch id alone: batch ids restart at 0 for every
    * new checkpoint, so a NEW query writing to a table a previous
    * query fed would find `b_0` present and silently drop its first
    * batches. The query id is stable across restarts of the SAME
    * checkpoint (it lives in checkpoint metadata), so re-delivery
    * dedup still works. (Markers written before this key existed are
    * simply ignored; the worst case on upgrade is ONE re-merged
    * batch, which the keyed merge absorbs idempotently — strictly
    * safer than a marker scheme that can drop a new query's data.) */
  private def markerPath(batchId: Long): Path = {
    val qid = Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY))
      .getOrElse("noquery")
    new Path(root, f"_stream_commits/q_${qid}_b_$batchId%020d")
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = markerPath(batchId)
    if (fs.exists(marker)) return // re-delivered batch: true no-op
    val qe = data.queryExecution
    val batch = Dataset.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = false)(spark))
    batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!batch.isEmpty)
        SnapshotStore.mergeCommit(spark, batch, root, key, versionCol, partitionCol)
    } finally batch.unpersist()
    // Marker after the commit: see the exactly-once note in the
    // class doc. Losing the race to create it is fine — someone
    // recorded the batch.
    try fs.create(marker, false).close()
    catch { case _: java.io.IOException => () }
  }

  override def toString: String = s"GraftSnapshotSink[$root, key=$key]"
}
