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
}
