package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.Dedup
import graft.sinks.SnapshotStore

/** Streaming corpus ingest with INCREMENTAL near-dup dedup — the
  * round-7 composition running continuously: each micro-batch of
  * documents deduplicates against the persisted MinHash signature
  * index ([[Dedup.minHashIndex]] rows in a snapshot store), survivors
  * append atomically to the accepted-corpus snapshot AND their
  * signatures to the index, so the next batch (or the next restart)
  * dedups against everything accepted so far.
  *
  * Crash/retry safety comes from the snapshot store's keyed merge
  * commits, not from streaming state: a re-delivered batch finds its
  * own signatures already in the index, drops every row as a
  * duplicate, and the keyed merges make the residual no-op idempotent
  * — the pattern q103 pins for the stock sink, applied to corpus
  * growth. State lives in the two snapshot tables, NOT in the
  * streaming state store, so it survives checkpoint loss and is
  * queryable (and time-travelable) mid-stream.
  *
  * Scale shape: per batch, the corpus side of the probe is the stored
  * index rows (never re-shingled documents); batch cost is the batch
  * signature pass + two equi-joins + two partition-scoped merge
  * commits. Nothing grows with corpus size except the index join's
  * shuffle, which partitions by `band`.
  */
object CorpusIngest {

  /** Start-ready writer: `docs` needs (id BIGINT, text STRING [, ...
    * carried columns]). Signatures use (numHashes, bands,
    * shingleWidth, fastHash) — the INDEX'S parameters; see
    * [[Dedup.minHashIndex]] on parameter identity. */
  def dedupingWriter(docs: DataFrame, indexRoot: String, acceptedRoot: String,
                     checkpoint: String,
                     numHashes: Int = 16, bands: Int = 4,
                     shingleWidth: Int = 3, threshold: Double = 0.5,
                     fastHash: Boolean = true): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val index = SnapshotStore.currentVersion(spark, indexRoot) match {
            case Some(_) => SnapshotStore.read(spark, indexRoot)
            case None => // cold start: empty index with the right shape
              Dedup.minHashIndex(batch.limit(0), col("text"), col("id"),
                numHashes, bands, shingleWidth, fastHash)
          }
          // Persist: the dedup DAG (batch shingling + two index joins)
          // would otherwise re-execute for the emptiness check AND
          // inside each merge commit (touched-partition collect +
          // data-file write each recompute their input) — ~5 plan
          // executions per batch on the continuous hot path.
          val survivors = Dedup.dedupIncremental(batch, col("text"), col("id"),
            index, numHashes, bands, shingleWidth, threshold, fastHash).persist()
          try {
            if (!survivors.isEmpty) {
              // Accepted docs: keyed merge (idempotent under re-delivery).
              SnapshotStore.mergeCommit(spark,
                survivors.withColumn("part", pmod(col("id"), lit(16))),
                acceptedRoot, keys = "id", versionCol = "id",
                partitionCols = "part")
              // Index rows: one row per (id, band) — key on the pair so
              // a re-delivered batch's signatures merge in place. Also
              // persisted: its one shingle pass over the (cached)
              // survivors would otherwise run once per commit phase.
              val sigs = Dedup.minHashIndex(survivors, col("text"), col("id"),
                  numHashes, bands, shingleWidth, fastHash)
                .withColumn("sig_key",
                  concat_ws("#", col("id").cast("string"), col("band").cast("string")))
                .persist()
              try SnapshotStore.mergeCommit(spark, sigs, indexRoot,
                keys = "sig_key", versionCol = "id", partitionCols = "band")
              finally sigs.unpersist()
            }
          } finally survivors.unpersist()
          ()
        }
      }
}
