package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time transforms (SURVEY.md §2.11). Each takes any events
  * relation — batch `read` or `readStream` — and returns the
  * transformed frame: Structured Streaming and batch share the one
  * definition, so the harness oracle-checks the exact code that runs
  * under a streaming sink (`StreamingSpec` drives it with a
  * MemoryStream + watermark).
  *
  * Watermark policy (ST4): callers attach `withWatermark("ts", gap)`
  * before these aggregations when streaming; rows later than the
  * watermark are dropped, state for closed windows is evicted — the
  * property that bounds state at 100 TB/day event volumes.
  */
object Streaming {

  /** Tumbling 1-hour windows per event type (ST1). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes (ST2): each event lands
    * in 4 overlapping windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  /** Per-user session windows with a 30-minute inactivity gap (ST3).
    * Session end = last event + gap (Spark's session_window
    * semantics); a gap of exactly 30 minutes starts a new session. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stateful dedup (ST5): first event per event_id wins. In
    * streaming, swap for `dropDuplicatesWithinWatermark` to bound
    * state by the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
}
