package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over an event stream — the
  * streaming analog of the batch q23 hourly rollup (events table:
  * ts/event_type/value). Append-mode: a window emits exactly once,
  * when the watermark passes its end; events later than `delay` behind
  * the max seen event time are dropped instead of reopening state.
  *
  * Scale: state is one row per (window, event_type); the watermark
  * bounds state size and makes the stream restart-safe (checkpointed
  * offsets + state store).
  */
object EventStream {

  /** Tumbling `width` counts+sums per event_type with a `delay`
    * lateness bound. Input schema: ts TIMESTAMP, event_type STRING,
    * value DOUBLE. */
  def windowedCounts(events: DataFrame, width: String = "1 hour",
                     delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval self/cross join: pair each fact event
    * with the SAME key's history events in the trailing `within`
    * window (at-or-before the fact, excluding the fact itself) — the
    * "what happened just before this event" enrichment. The time
    * bound on BOTH event-time columns plus the watermarks is exactly
    * what lets Spark run this stream×stream with bounded state: a
    * buffered row is dropped once the other side's watermark passes
    * its join window. The same expression runs in batch (watermarks
    * are no-ops there), so batch/stream equivalence is structural.
    * Input schema both sides: `key`, ts TIMESTAMP, event_id, value. */
  def recentActivity(facts: DataFrame, history: DataFrame,
                     key: String = "user_id", within: String = "10 minutes",
                     delay: String = "30 minutes"): DataFrame =
    facts.withWatermark("ts", delay).alias("l")
      .join(history.withWatermark("ts", delay).alias("r"),
        expr(s"l.$key = r.$key" +
          s" AND r.ts >= l.ts - INTERVAL $within AND r.ts <= l.ts" +
          " AND r.event_id != l.event_id"),
        "inner")
      .select(col(s"l.$key").as(key), col("l.ts").as("ts"),
        col("l.event_id").as("event_id"),
        col("r.event_id").as("prior_event_id"),
        col("r.ts").as("prior_ts"),
        col("r.value").as("prior_value"))

  /** Streaming exact dedup on content fingerprint (the L1 exact-dedup
    * operator for document STREAMS): the first document with a given
    * normalized-text fingerprint passes, repeats are dropped.
    *
    * `dropDuplicatesWithinWatermark` keys the dedup state by
    * fingerprint and — unlike plain streaming dropDuplicates, whose
    * state grows forever — evicts a fingerprint once the watermark
    * passes its event time + `delay`, so state is bounded by the
    * dedup horizon, not the stream's lifetime. Input schema: ts
    * TIMESTAMP, text STRING (+ any payload columns, all carried). */
  def dedupStream(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", graft.functions.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming gap sessionization — the stream form of the batch q92
    * gaps-and-islands rollup, on Spark's native `session_window`:
    * per-key sessions that MERGE while successive events arrive within
    * `gap` of each other (strictly-greater breaks only — two events
    * exactly `gap` apart share a session) and close at last-event +
    * gap. Append mode: a session row emits exactly ONCE, when the
    * watermark passes its end — so downstream sees only finalized
    * sessions, and an event later than `delay` can neither reopen nor
    * duplicate one (it is dropped).
    *
    * Scale: state is one open session per active key — session windows
    * merge in place as events arrive, and the watermark both bounds
    * lateness and evicts closed sessions, so state tracks concurrent
    * activity, not stream history. Input schema: `key`, ts TIMESTAMP,
    * value DOUBLE-ish. */
  def sessionizeStream(events: DataFrame, key: String = "user_id",
                       gap: String = "15 minutes",
                       delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col(key), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col(key), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))
}
