package graft.streaming

import graft.ops.PipelineOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the continuous form of
  * [[graft.ops.PipelineOps.sessionize]] (SURVEY.md §2.9 X7) built on
  * Spark's native `session_window`, not custom state: merging session
  * windows is exactly the built-in's semantics, so the engine gets
  * watermark handling, state eviction and append-mode finalization from
  * the platform (SURVEY.md §4.3's "compose existing ops" rule).
  *
  * Gap alignment: the batch rule keeps an event in the session when
  * `ts − prev <= gap` (strictly-greater starts a new one), and
  * `session_window` windows `[ts, ts+gap)` merge when they overlap OR
  * touch (an event exactly `gap` after the last still merges —
  * verified by the boundary case in the spec), so the same `gap` value
  * yields the identical partition of events and closed streaming
  * sessions match the batch operator row-for-row (pinned by test).
  *
  * Scale notes: state is one open session per active (metric) key —
  * merged interval + aggregates, evicted the moment the watermark
  * passes `end`; arrivals shuffle once by metric. Append mode emits a
  * session exactly once, when it can no longer grow — the streaming
  * analog of the batch operator's "gap exceeded" finalization. The
  * hot-key caveat is the same as batch X7's, and the same X18 day-split
  * answer applies upstream (pre-bucket the stream's key) if one metric
  * dominates.
  */
object StreamSessionize {

  /** Closed sessions of a streaming `points(metric, ts_s, value)` frame:
    * (metric, session_start, n_events, duration_s), identical schema
    * and values to the batch operator. `watermark` bounds disorder —
    * events later than it are dropped (the F3 analog).
    */
  def sessionizeStream(
      points: DataFrame,
      gapS: Long = PipelineOps.SessionGapS,
      watermark: String = "1 hour"): DataFrame =
    points
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), session_window(col("ts"), s"$gapS seconds"))
      .agg(
        min(col("ts_s")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"))
      .select("metric", "session_start", "n_events", "duration_s")
}
