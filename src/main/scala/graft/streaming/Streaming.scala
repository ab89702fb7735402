package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * semantics); an event at EXACTLY gap distance still merges —
    * sessions split only when the gap strictly exceeds 30 minutes
    * (pinned by StreamingSpec's boundary test; the DuckDB oracle's
    * break predicate is `>`, not `>=`). */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-static enrichment join (ST8): events joined to a static
    * dimension `dim(user_id, segment)`, then tumbling 1-hour counts
    * per segment. Stream-static inner joins are STATELESS — each
    * micro-batch probes the static side (broadcast at dim sizes, and
    * the hint survives under `readStream`), so unlike the
    * stream-stream band join (ST7) no join state accumulates and no
    * watermark is needed for the join itself, only for the windowed
    * aggregation downstream. The canonical "enrich the firehose with
    * reference data" shape. */
  def enrichedTumbling(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("segment"), col("n"), col("sum_value"))

  /** ST4 (watermark policy) as a deterministic relation: the
    * append-mode output of the watermarked tumbling aggregation once
    * the stream is exhausted — exactly the windows whose end is at or
    * below the terminal watermark `max(ts) - delay`; windows still
    * open when the stream ends are withheld, the same rows a
    * `withWatermark(ts, delay)` + append-mode sink would have emitted.
    * The watermark rides along as a 1-row broadcast aggregate — no
    * collect, no driver scalar; at scale this is one extra reduce. */
  def tumblingClosed(events: DataFrame, delayMinutes: Int = 10): DataFrame = {
    val wm = events.agg(
      (max(col("ts")) - expr(s"INTERVAL $delayMinutes MINUTES")).as("wm"))
    tumblingCounts(events)
      .crossJoin(broadcast(wm))
      .filter(col("we") <= col("wm"))
      .select(col("ws"), col("we"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Stateful dedup (ST5): first event per event_id wins. In
    * streaming, swap for `dropDuplicatesWithinWatermark` to bound
    * state by the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stream-stream band join (ST7): click→purchase attribution within
    * a 10-minute window, the streaming face of the batch range join
    * (`ops.Joins.rangeCore`, q_join_range). Both inputs carry
    * watermarks (callers attach them when streaming); the time-range
    * predicate is what lets Spark bound each side's join state — a
    * click older than watermark + 10 min can never match a future
    * purchase, so its buffered row is evicted. Without the range
    * bound, stream-stream inner join state grows without limit. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val b = purchases.select(col("user_id").as("b_user"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(b,
      col("user_id") === col("b_user") &&
      col("purchase_ts") > col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** ST9: the LEFT OUTER stream-stream band join — [[clickToPurchase]]
    * that also reports UNCONVERTED clicks, the attribution shape a
    * funnel team actually ships (the inner join silently drops every
    * click that never converts — usually most of them). Streaming
    * semantics are what make this its own operator: a matched row can
    * emit within its micro-batch, but a null-extended row exists only
    * once the watermark passes the click's join window (until then the
    * click sits in join state, still eligible for a future purchase) —
    * the stream-executed StreamingSpec test drives exactly that
    * flush. Batch execution evaluates the same plan over complete
    * input, so the outer rows are simply the unmatched clicks. */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val b = purchases.select(col("user_id").as("b_user"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(b,
      col("user_id") === col("b_user") &&
      col("purchase_ts") > col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  // ----- custom state: flatMapGroupsWithState sessionization -----

  // event_id rides along solely as the in-batch sort tiebreak below —
  // without it, two events at the same timestamp would fold sum_value
  // in nondeterministic order (and the q_stream_stateful oracle
  // tiebreaks equal timestamps by event_id)
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double, event_id: Long)
  case class SessionBuf(start: Long, lastTs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Epoch micros of a Timestamp — `getTime` alone is millis and
    * would silently truncate the harness's microsecond event times
    * (the nanos field carries the sub-millisecond part). */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Hand-rolled sessionization on the raw state API
    * (`flatMapGroupsWithState` + EventTimeTimeout) — what
    * `session_window` compiles to under the hood, exposed for
    * semantics the built-in can't express (custom merge logic,
    * per-session early emission). A session closes either when a
    * later event of the same user arrives past the gap (emitted
    * immediately) or when the event-time watermark passes
    * last_ts + gap (timeout fires). State per user is one fixed-size
    * buffer — bounded regardless of stream length. All state
    * arithmetic is in epoch MICROS, full event-time precision.
    *
    * Within a micro-batch, new events are sorted in memory: per-group
    * per-batch volume is watermark-bounded, not stream-bounded.
    * Callers must attach `withWatermark("ts", ...)` (EventTimeTimeout
    * requires it). In batch execution timeouts never fire, so each
    * user's final (still-open) session is not emitted — the streaming
    * semantics, applied literally (q_stream_stateful's oracle excludes
    * exactly those trailing sessions). */
  case class RetractOut(user_id: Long, retracted_ts: java.sql.Timestamp,
      retracted_event: Long, retracted_value: Double,
      superseded_ts: java.sql.Timestamp, superseded_event: Long)

  /** CDC retraction stream (ST10, r8 — the Flink "retract stream" /
    * materialized-view invalidation shape): treat the keyed event log
    * as an UPDATE stream (each event is a new version of its user's
    * state) and emit, for every version that gets superseded, ONE
    * retraction row naming both the stale version and its successor —
    * exactly what a downstream cache or incremental view consumes to
    * invalidate. The complement of the batch compaction (E4
    * q_compact_latest emits what SURVIVES; this emits what was
    * retracted, with provenance).
    *
    * State per key is the single latest version — bounded by |keys|,
    * never by stream length (a production deployment adds a TTL
    * timeout; none is needed for the parity contract). This is
    * MEASURED, not asserted: StreamSmoke reads
    * lastProgress.stateOperators.numRowsTotal after every micro-batch
    * (including across a checkpoint stop/restart) and requires it to
    * equal the distinct keys delivered so far (STATE_BOUND lines).
    * Within a
    * micro-batch versions sort by (ts, event_id), the house
    * event-time order. A version arriving AFTER a newer one was seen
    * (cross-batch lateness) is stale ON ARRIVAL and is retracted
    * immediately by the then-current state (StreamingSpec pins it);
    * when per-key arrival order respects event order — the standard
    * CDC transport guarantee — the output is exactly the batch face's
    * LEAD pairs, which is what the oracle replays. */
  def retractions(events: Dataset[Ev]): Dataset[RetractOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Ev, RetractOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[Ev]) =>
          def key(e: Ev): (Long, Long) = (tsMicros(e.ts), e.event_id)
          def before(a: Ev, b: Ev): Boolean = {
            val (ka, kb) = (key(a), key(b))
            ka._1 < kb._1 || (ka._1 == kb._1 && ka._2 < kb._2)
          }
          val out = scala.collection.mutable.ListBuffer.empty[RetractOut]
          var cur = state.getOption
          it.toSeq.sortBy(key).foreach { e =>
            cur match {
              case Some(c) if before(e, c) => // stale on arrival
                out += RetractOut(user, e.ts, e.event_id, e.value, c.ts, c.event_id)
              case Some(c) =>
                out += RetractOut(user, c.ts, c.event_id, c.value, e.ts, e.event_id)
                cur = Some(e)
              case None =>
                cur = Some(e)
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** The maintained view row of [[maintainView]]: one user's current
    * materialized state — aggregate counters (exact integer cents, the
    * house money discipline) plus the latest version's identity. */
  case class ViewOut(user_id: Long, n_versions: Long, sum_cents: Long,
      last_ts: java.sql.Timestamp, last_event_id: Long, last_value_cents: Long)

  case class ViewState(n: Long, cents: Long,
      lastTs: Long, lastEvent: Long, lastCents: Long)

  /** Incremental view maintenance (ST11, r9 — the consumer of
    * [[retractions]]' update stream): maintain a per-user materialized
    * view — version count, exact money sum, and the latest version —
    * by applying each arriving version as a +delta against held
    * state, and emit the UPDATED view row once per key per
    * micro-batch (the classic IVM "upsert stream" a downstream cache
    * ingests). State per key is one fixed-size record, bounded by
    * |keys| like [[retractions]] — and measured the same way:
    * StreamSmoke's STATE_BOUND lines pin numRowsTotal == distinct
    * keys after every micro-batch, through a checkpoint stop/restart.
    *
    * The maintenance fold is deliberately CONFLUENT (order-
    * independent): count and sum are commutative +deltas, and the
    * latest-version slot is a max by the house event-time key
    * (ts_micros, event_id) — a LATE version (older than held state)
    * still lands its +delta but cannot regress the latest slot. So
    * the converged view is identical whatever the arrival order, and
    * the batch face (one group per user = the final view) IS the
    * streaming fixed point — StreamingSpec asserts view ≡ the E4
    * batch compaction after EVERY micro-batch, not just at the end.
    *
    * Money stays exact: each version's value quantizes to integer
    * cents via the same HALF_UP 2-decimal contract as the oracle's
    * `CAST(value AS DECIMAL(18,2)) * 100` (BigDecimal.valueOf =
    * Double.toString semantics, matching Spark's own double→decimal
    * cast), so the running sum is long arithmetic at any mass. */
  def maintainView(events: Dataset[Ev]): Dataset[ViewOut] = {
    import events.sparkSession.implicits._
    // ASSUMES the house 2-decimal generator contract (TESTDATA.md:
    // events.value is emitted at exactly 2 decimals, so the binary
    // double is the shortest repr of a 2-decimal literal and HALF_UP
    // never actually fires). BigDecimal.valueOf (Double.toString
    // shortest-repr) + HALF_UP matches Spark's own double→decimal
    // cast; DuckDB's CAST(v AS DECIMAL(18,2)) instead rounds the
    // EXACT binary value, so a value like 1.005 (binary ≈1.00499…)
    // would yield 101 here but 100 in DuckDB — a divergence the
    // generator contract keeps unreachable, same as every other cents
    // site in the house (see bench/ROUNDING_CONTRACTS.md).
    def cents(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ViewState, ViewOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[ViewState]) =>
          var st = state.getOption
            .getOrElse(ViewState(0L, 0L, Long.MinValue, Long.MinValue, 0L))
          it.foreach { e =>
            val (t, c) = (tsMicros(e.ts), cents(e.value))
            val newer = t > st.lastTs || (t == st.lastTs && e.event_id > st.lastEvent)
            st = ViewState(st.n + 1, st.cents + c,
              if (newer) t else st.lastTs,
              if (newer) e.event_id else st.lastEvent,
              if (newer) c else st.lastCents)
          }
          state.update(st)
          Iterator.single(ViewOut(user, st.n, st.cents,
            microsTs(st.lastTs), st.lastEvent, st.lastCents))
      }
  }

  def statefulSessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionBuf]) =>
          def emit(b: SessionBuf): SessionOut = SessionOut(user,
            microsTs(b.start), microsTs(b.lastTs + gapUs), b.n, b.sum)
          if (state.hasTimedOut) {
            val closed = emit(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var buf = state.getOption
            it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
              val t = tsMicros(e.ts)
              buf = buf match {
                // <= : an event at exactly gap distance merges, matching
                // session_window (see the boundary spec)
                case Some(b) if t - b.lastTs <= gapUs =>
                  Some(SessionBuf(b.start, math.max(b.lastTs, t), b.n + 1, b.sum + e.value))
                case Some(b) =>
                  out += emit(b)
                  Some(SessionBuf(t, t, 1L, e.value))
                case None =>
                  Some(SessionBuf(t, t, 1L, e.value))
              }
            }
            buf.foreach { b =>
              state.update(b)
              // the timeout clock is event-time MILLIS (floor — firing
              // 1ms early is impossible, <1ms late is irrelevant)
              state.setTimeoutTimestamp(Math.floorDiv(b.lastTs + gapUs, 1000L))
            }
            out.iterator
          }
      }
  }
}
