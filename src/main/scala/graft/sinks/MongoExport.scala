package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** mongoimport-compatible export — the bridge for a reference user
  * whose load path is MongoDB `bulk_write` upsert (ref:
  * mongodb_loader.py:93-197): one JSON document per line, keyed by
  * `_id`, consumable by `mongoimport --mode upsert` against the same
  * collections the reference maintains.
  *
  * The K8 semantics the reference implements imperatively — RECURSIVE
  * datetime serialization through arbitrarily nested documents
  * (mongodb_loader.py:357-370, a python tree-walk converting every
  * datetime to ISO-8601 before insert) — fall out declaratively here:
  * `to_json` serializes TimestampType/DateType at EVERY nesting depth
  * (structs, arrays, maps) through one codegen'd expression, with the
  * format pinned by options rather than per-field code. That is the
  * documented reason K8 needed no port of the tree-walk: the engine's
  * serializer is already recursive and type-driven.
  *
  * Scale: the export is one map-side projection — no shuffle, no
  * driver collection; `export` writes text partitions that mongoimport
  * consumes file-by-file. */
object MongoExport {

  /** ISO-8601 with UTC marker, second precision — matches the
    * reference's `datetime.isoformat()` output for its
    * timezone-naive-UTC datetimes. */
  val IsoTimestamp = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  val IsoDate = "yyyy-MM-dd"

  /** One mongoimport-ready JSON line per row: `idCol` becomes the
    * leading `_id` field, every other column keeps its name, and all
    * temporal values at any depth serialize ISO-8601. Null fields are
    * omitted (Mongo's absent-field convention, and what the
    * reference's dict-based documents produce). */
  def mongoJson(df: DataFrame, idCol: String,
                timestampFormat: String = IsoTimestamp): Dataset[String] = {
    require(df.columns.contains(idCol), s"id column '$idCol' not in ${df.columns.mkString(",")}")
    val spark = df.sparkSession
    import spark.implicits._
    // A null key would serialize as a document with NO _id field —
    // mongoimport would insert an unkeyed document instead of
    // upserting. That is data corruption, not a formatting choice:
    // fail the task at the offending row.
    val id = when(col(idCol).isNull,
      raise_error(lit(s"mongoJson: null $idCol cannot key an upsert document")))
      .otherwise(col(idCol))
    val doc = struct(
      id.as("_id") +:
        df.columns.filterNot(_ == idCol).map(col).toIndexedSeq: _*)
    df.select(to_json(doc, Map(
      "timestampFormat" -> timestampFormat,
      "dateFormat" -> IsoDate,
      // Pin the documented null-omission contract; without this it
      // silently follows spark.sql.jsonGenerator.ignoreNullFields.
      "ignoreNullFields" -> "true")).as("json")).as[String]
  }

  /** Write the export as JSON-lines text partitions under `path`
    * (`mongoimport <part> --collection c --mode upsert`). */
  def `export`(df: DataFrame, idCol: String, path: String,
             timestampFormat: String = IsoTimestamp): Unit =
    mongoJson(df, idCol, timestampFormat).write.mode("overwrite").text(path)

  /** Streaming export — the `foreachBatch` connector mode a user
    * replacing the reference's continuous Mongo load runs: each
    * micro-batch lands as its own `batch_<id>/` directory of
    * mongoimport-ready JSON lines (same `_id`-keyed upsert documents
    * as [[export]], so importing batches in order replays the
    * stream). Idempotent under crash/retry: a re-delivered batch id
    * OVERWRITES its own directory — the import sees one copy. Feed
    * directories to `mongoimport --mode upsert` as they appear. */
  def exportStream(df: DataFrame, idCol: String, dir: String, checkpoint: String,
                   timestampFormat: String = IsoTimestamp)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty)
          mongoJson(batch, idCol, timestampFormat)
            .write.mode("overwrite").text(s"$dir/batch_$bid")
      }
}
