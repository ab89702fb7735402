package graft.ops

import graft.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch renderings of the event-time operators (SURVEY.md §2.11):
  * the deterministic, oracle-checkable face of [[Streaming]] — the
  * same transform functions run here over a batch scan and in
  * `StreamingSpec` over a MemoryStream.
  */
object Events {

  def streamTumbling(s: SparkSession, d: String): DataFrame =
    Streaming.tumblingCounts(Tables.events(s, d))
      .orderBy(col("ws"), col("event_type"))

  def streamSliding(s: SparkSession, d: String): DataFrame =
    Streaming.slidingCounts(Tables.events(s, d))
      .orderBy(col("ws"))

  def streamSession(s: SparkSession, d: String): DataFrame =
    Streaming.sessionize(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_start"))

  /** Watermark policy (ST4) as a declared query: closed windows only —
    * see [[Streaming.tumblingClosed]]. */
  def streamWatermark(s: SparkSession, d: String): DataFrame =
    Streaming.tumblingClosed(Tables.events(s, d))
      .orderBy(col("ws"), col("event_type"))

  /** Stateful dedup (ST5) as a declared query: the input is doubled
    * (union all with itself) so `dropDuplicates(event_id)` has real
    * work; first-event-wins semantics, oracle is the plain relation. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
    Streaming.dedupEvents(ev.unionByName(ev))
      .orderBy(col("event_id"))
  }

  /** ST6 as a declared query: the batch face of the raw-state-API
    * sessionization ([[Streaming.statefulSessions]]). Batch execution
    * fires no timeouts, so each user's final (still-open) session is
    * withheld — exactly what the streaming operator would hold in
    * state awaiting the watermark; the oracle's QUALIFY drops the same
    * trailing session per user. sum_value is accumulated in event-time
    * order inside the state buffer; the 2-decimal round absorbs the
    * cross-engine summation-order ULPs like every other double agg. */
  def streamStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"))
      .as[Streaming.Ev]
    Streaming.statefulSessions(ev).toDF()
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** ST7 as a declared query: the batch face of the stream-stream
    * band join ([[Streaming.clickToPurchase]]) — click→purchase
    * attribution within 10 minutes, both sides carved from the one
    * events relation. The same range predicate that bounds streaming
    * join state is what the oracle replays as a plain range join. */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Streaming.clickToPurchase(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding"  -> streamSliding,
    "q_stream_session"  -> streamSession,
    "q_stream_dedup"    -> streamDedup,
    "q_stream_watermark" -> streamWatermark,
    "q_stream_stateful" -> streamStateful,
    "q_stream_join"     -> streamJoin,
  )

  val oracles: Map[String, String] = Map(
    // window(ts, 1h) aligns to the epoch grid == date_trunc('hour').
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""",
    // An event at t belongs to the 4 slide-grid windows with
    // start in (t - 1h, t]: start = floor15(t) - k*15min, k in 0..3.
    "q_stream_sliding" ->
      """WITH base AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS fb, ts FROM events),
         expanded AS (SELECT fb - unnest([0, 1, 2, 3]) * INTERVAL 15 MINUTE AS ws FROM base)
         SELECT ws, count(*) AS n FROM expanded GROUP BY ws ORDER BY ws""",
    "q_stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type FROM events
         ORDER BY event_id""",
    // terminal watermark = max(ts) - 10min; only windows closed at or
    // below it are emitted (the append-mode output set)
    "q_stream_watermark" ->
      """WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events),
         agg AS (SELECT date_trunc('hour', ts) AS ws,
                        date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
                        event_type, count(*) AS n, round(sum(value), 2) AS sum_value
                 FROM events GROUP BY 1, 2, 3)
         SELECT a.ws, a.we, a.event_type, a.n, a.sum_value
         FROM agg a CROSS JOIN wm WHERE a.we <= wm.wm
         ORDER BY ws, event_type""",
    // Same gaps-and-islands recurrence as q_stream_session, but the
    // QUALIFY drops each user's LAST session — in batch execution no
    // timeout ever fires, so the state operator never emits the
    // still-open trailing session (see streamStateful's scaladoc)
    "q_stream_stateful" ->
      """WITH marked AS (
           SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked),
         agg AS (
           SELECT user_id, min(ts) AS session_start,
                  max(ts) + INTERVAL 30 MINUTE AS session_end,
                  count(*) AS n_events, round(sum(value), 2) AS sum_value
           FROM sess GROUP BY user_id, sid)
         SELECT user_id, session_start, session_end, n_events, sum_value
         FROM agg
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY session_start DESC) > 1
         ORDER BY user_id, session_start""",
    "q_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
                c.ts AS click_ts, p.ts AS purchase_ts
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         ORDER BY click_id, purchase_id""",
    // Gaps-and-islands: a new session starts when the gap since the
    // previous event of the same user STRICTLY exceeds 30 minutes (an
    // event at exactly gap distance merges — session_window
    // semantics); session end = last event + gap.
    "q_stream_session" ->
      """WITH marked AS (
           SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           -- same total order (ts, event_id) as the brk window: with
           -- duplicate (user_id, ts) rows an arbitrary tie order could
           -- assign the break to the wrong row and split a session
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
  )
}
