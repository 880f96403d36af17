package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the canonical
  * user-activity rollup for training-data pipelines (and the
  * streaming-shaped cousin of the reference's batch run accounting).
  * One declarative `session_window` expression serves BOTH the batch
  * table and the watermarked stream, so batch/stream equivalence is
  * by construction, not by parallel implementations.
  *
  * Scale: the batch plan is one shuffle on the grouping key (Spark
  * plans session_window as a sort-merge within key partitions, never
  * a self-join); streaming state is one open session per key, evicted
  * once the watermark passes session end + gap.
  */
object Sessionize {

  /** Per-user sessions with a `gap` inactivity bound. A session's
    * start is its first event's timestamp, `session_end` its LAST
    * EVENT's timestamp (not the speculative end-plus-gap), so the
    * output is replayable from the event log alone. Input schema:
    * `userCol`, ts TIMESTAMP, value DOUBLE. */
  def sessions(events: DataFrame, userCol: String = "user_id",
               gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        max(col("ts")).as("last_ts"))
      .select(col(userCol),
        col("w.start").as("session_start"),
        col("last_ts").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming variant: identical aggregation over a watermarked
    * stream. Append mode — a session emits exactly once, when the
    * watermark passes its close; events later than `delay` behind the
    * max seen event time can no longer reopen it. */
  def sessionStream(events: DataFrame, userCol: String = "user_id",
                    gap: String = "30 minutes",
                    delay: String = "30 minutes"): DataFrame =
    sessions(events.withWatermark("ts", delay), userCol, gap)
}
