package graft.ops

import graft.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .as[Streaming.Ev]
    Streaming.statefulSessions(ev).toDF()
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** ST10 as a declared query: the batch face of the CDC retraction
    * stream ([[Streaming.retractions]]) — for every event version
    * that a later version of the same user supersedes, one row naming
    * the stale version and its successor (the complement of E4's
    * compaction: q_compact_latest keeps the survivors, this emits the
    * retractions with provenance). Batch execution delivers each
    * user's versions in one sorted group, so the output is exactly
    * the per-user LEAD pairing the oracle replays; the streaming
    * run's late-arrival semantic (stale on arrival → retracted by the
    * then-current state) is pinned in StreamingSpec. */
  def streamRetract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .as[Streaming.Ev]
    Streaming.retractions(ev).toDF()
      .orderBy(col("user_id"), col("retracted_ts"), col("retracted_event"))
  }

  /** ST11 as a declared query: the batch face of incremental view
    * maintenance ([[Streaming.maintainView]]) — the per-user
    * materialized view (version count, exact cent sum, latest
    * version) after the whole update stream has been applied. The
    * maintenance fold is confluent (commutative +deltas, max-by-key
    * latest slot), so batch execution — one group per user — lands on
    * the SAME fixed point the micro-batched streaming run converges
    * to; StreamingSpec asserts the parity after every micro-batch
    * against the E4 compaction. The oracle replays the view as a
    * plain recompute: COUNT/SUM over exact cents plus the
    * row_number-1 latest row — recompute ≡ incremental is the IVM
    * correctness statement itself. */
  def streamIvm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .as[Streaming.Ev]
    Streaming.maintainView(ev).toDF().orderBy(col("user_id"))
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

  /** ST9 as a declared query: the batch face of the LEFT OUTER
    * stream-stream band join ([[Streaming.clickToPurchaseOuter]]) —
    * attribution that keeps unconverted clicks as null-extended rows
    * (what streaming emits once the watermark passes a click's join
    * window). Null purchase ids sort FIRST on both engines by explicit
    * direction — Spark's asc default and DuckDB's differ, so the
    * order is never left implicit. */
  def streamJoinOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Streaming.clickToPurchaseOuter(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy(col("click_id").asc, col("purchase_id").asc_nulls_first)
  }

  /** ST8 as a declared query: the batch face of the stream-static
    * enrichment join ([[Streaming.enrichedTumbling]]) — every event
    * enriched with its user's market segment from the `customer` dim,
    * rolled into tumbling hourly counts per segment. */
  def streamEnrich(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    Streaming.enrichedTumbling(Tables.events(s, d), dim)
      .orderBy(col("ws"), col("segment"))
  }

  /** Changelog compaction (E4, r4): latest state per key — the
    * log-compacted view every CDC/upsert pipeline materializes.
    * Rendered as ONE partial-aggregated `max(struct(...))` per key
    * (struct ordering = lexicographic, so (ts, event_id) embeds the
    * "latest, tiebreak by id" order into a combiner-friendly
    * aggregate): map-side partials shrink each partition to its
    * per-key champions BEFORE the shuffle, so the wire carries one
    * row per (partition, key). The window rendering
    * (`row_number() = 1`, the oracle's) sorts entire key histories
    * instead — correct, but strictly more work at any scale. */
  def compactLatest(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("last"))
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"), col("last.value").as("last_value"))
      .orderBy(col("user_id"))

  /** Time-series densification (E3, r4): hourly counts per event type
    * INCLUDING empty hours — the gap-filling step every downstream
    * charting/anomaly job needs, because a missing bucket and a
    * zero bucket are different facts. The hour spine generates from
    * the 1-row [min, max] aggregate (`sequence` + explode — never a
    * driver loop), the type dim broadcasts, and the observed counts
    * left-join onto the dense spine. Spine size is bounded by
    * time-span × type-cardinality, independent of event volume. */
  def densify(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val counts = e.groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("n"))
    val spine = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val types = e.select(col("event_type")).distinct()
    spine.crossJoin(broadcast(types))
      .join(counts, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("h"), col("event_type"))
  }

  /** Linear multi-touch attribution (E5, r4): every purchase's value
    * splits EQUALLY across the user's clicks in the prior 24 hours,
    * and each click reports the credit it accumulated — the marketing
    * analytics complement of the last-touch as-of join (J6 gives each
    * purchase ONE click; this gives every touch its share). The join
    * is the house band shape: user_id equi-key anchors the shuffle,
    * the 24h window rides as a residual predicate, so candidates are
    * bounded by per-user activity — never |events|². Credit = value /
    * touch-count is an exact integer-count division both engines
    * compute identically; per-click credit sums are rounded at 4 (the
    * lockstep rule — few purchases per click, sums tiny). Clicks that
    * touched no purchase are absent (no zero-credit sentinels),
    * matching the oracle's inner-join semantics. */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionCore(Tables.events(s, d))

  /** Credit split over any events relation — DataFrame-parameterized
    * so AnalyticsSpec can pin the split arithmetic by hand. */
  def attributionCore(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    val touches = clicks.join(buys, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
    val k = Window.partitionBy(col("purchase_id"))
    touches
      .withColumn("credit", col("value") / count(lit(1)).over(k))
      .groupBy(col("click_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("credit")), 4).as("attributed"))
      .orderBy(col("click_id"))
  }

  /** Churn label + feature builder (E-family extension): the
    * supervised-training-data shape behind every retention model —
    * split the event range at its midpoint, build per-user features
    * from the FEATURE half (event count, active days, cent-exact
    * spend, days silent before the split) and the label from the
    * LABEL half (churned = no event at or after the split). The
    * split point is the dataset's own (min+max)/2 in exact integer
    * microseconds (the q_merge_upsert midpoint contract — both
    * engines derive the identical long), so the window definition
    * ships with the data instead of a wall clock. Scale: one
    * broadcast 1-row bounds agg, one user rollup over the feature
    * half, one distinct over the label half, one left join keyed on
    * user — label absence IS the label, so no anti join re-pays the
    * probe. */
  def churnLabels(s: SparkSession, d: String): DataFrame =
    churnLabelsCore(Tables.events(s, d))

  /** Builder over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin the split boundary (an event exactly AT
    * the midpoint is label-half, hence retained) by hand. */
  def churnLabelsCore(ev: DataFrame): DataFrame = {
    val bounds = ev.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2").as("mid"))
    val withMid = ev.crossJoin(broadcast(bounds))
    val feat = withMid.filter(unix_micros(col("ts")) < col("mid"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_active_days"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"),
        max(unix_micros(col("ts"))).as("last_us"),
        min(col("mid")).as("mid"))
    val retained = withMid.filter(unix_micros(col("ts")) >= col("mid"))
      .select(col("user_id")).distinct()
      .withColumn("seen", lit(true))
    feat.join(retained, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_active_days"),
        col("value_cents"),
        expr("(mid - last_us) DIV 86400000000").as("days_silent"),
        col("seen").isNull.as("churned"))
      .orderBy(col("user_id"))
  }

  /** Time-decay multi-touch attribution (E-family extension): like
    * [[attributionCore]] but recent clicks earn MORE of the purchase
    * than stale ones — the industry-standard decay model next to the
    * linear split (E5). Weights are EXACT DYADIC integers, never a
    * pow() float: the 24h window quantizes into 6h half-life steps
    * k = Δ div 6h ∈ {0..4}, weight unit wu = 16 >> k (16, 8, 4, 2, 1),
    * credit = value·wu/Σwu per purchase — both engines divide
    * identical operands (the q_ewma dyadic-decay precedent). Per-click
    * credit sums round at 4 (the E5 contract). Scale shape is E5's:
    * the touch join is user-keyed and 24h-banded, the weight
    * normalizer is one purchase-partition window, the rollup is one
    * grouped agg — nothing new shuffles. */
  def attributionDecay(s: SparkSession, d: String): DataFrame =
    attributionDecayCore(Tables.events(s, d))

  /** Decay split over any events relation — DataFrame-parameterized
    * so AnalyticsSpec can pin the half-life boundaries by hand. */
  def attributionDecayCore(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    val touches = clicks.join(buys, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
      .withColumn("wu", expr(
        "shiftright(CAST(16 AS BIGINT), CAST((unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 21600000000 AS INT))"))
    val k = Window.partitionBy(col("purchase_id"))
    touches
      .withColumn("credit",
        col("value") * col("wu") / sum(col("wu")).over(k))
      .groupBy(col("click_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("credit")), 4).as("attributed"))
      .orderBy(col("click_id"))
  }

  /** Session path mining (E12, r4): the top event-type sequences
    * users actually walk within a session — "view>click>purchase"
    * style clickstream analysis. Sessions come from the same
    * gaps-and-islands recurrence as ST3/ST6 (lag break-mark +
    * running sum, both on the user partition); each session's first
    * 5 event types (truncation bounds distinct-path cardinality —
    * untruncated paths are unbounded-cardinality group keys at
    * corpus scale) join into one path string via a deterministic
    * struct sort on (ts, event_id), then one grouped count per path.
    * Event volume crosses exactly two shuffles: the user-partition
    * window and the path rollup. */
  def pathMining(s: SparkSession, d: String): DataFrame =
    pathMiningCore(Tables.events(s, d))

  /** Path extraction over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin session
    * splitting, ordering, and truncation by hand. */
  def pathMiningCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val sess = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("brk", when(gap.isNull || gap > 30L * 60L * 1000000L, 1).otherwise(0))
      .withColumn("sid",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("session_len"),
        array_join(
          slice(transform(array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))), x => x.getField("event_type")), 1, 5), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("session_len")), 4).as("avg_len"))
      .orderBy(col("path"))
  }

  /** MERGE / upsert (E11, r4): a base snapshot (each user's latest
    * state in the first half of the time range) merged with a delta
    * changelog (the second half) — the lakehouse MERGE INTO shape:
    * delta wins where both exist, base rows without delta carry
    * forward, delta rows without base insert, and every output row
    * says which case it was. The time split is the integer midpoint
    * of the [min, max] event-time range in exact MICROSECONDS (a
    * broadcast 1-row aggregate — both engines floor-divide the same
    * longs, so the split is bit-identical and scale-free). Each side
    * compacts via [[compactLatest]]'s combiner-friendly max(struct)
    * BEFORE the full-outer join, so the join moves one row per
    * (side, user) — at 100 TB the merge costs two compactions and
    * one key-aligned shuffle, never a row-level diff. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame =
    mergeUpsertCore(Tables.events(s, d))

  /** Snapshot+delta merge over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin all three merge
    * cases by hand. */
  def mergeUpsertCore(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    val mid = ev.agg(((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid_us"))
    val stamped = ev.crossJoin(broadcast(mid))
    def latest(side: DataFrame, pre: String) = side
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("l"))
      .select(col("user_id"), col("l.ts").as(s"${pre}_ts"),
        col("l.event_type").as(s"${pre}_type"), col("l.value").as(s"${pre}_value"))
    val base = latest(stamped.filter(col("us") <= col("mid_us")), "base")
    val delta = latest(stamped.filter(col("us") > col("mid_us")), "delta")
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("delta_ts"), col("base_ts")).as("last_ts"),
        coalesce(col("delta_type"), col("base_type")).as("last_type"),
        coalesce(col("delta_value"), col("base_value")).as("last_value"),
        when(col("delta_ts").isNotNull && col("base_ts").isNotNull, lit("upsert"))
          .when(col("base_ts").isNull, lit("insert"))
          .otherwise(lit("carry")).as("src"))
      .orderBy(col("user_id"))
  }

  /** SCD Type-2 state intervals (E6, r4): each user's event_type
    * stream compacted into validity intervals [valid_from, valid_to)
    * — consecutive same-state events collapse into one interval, the
    * current state's valid_to is NULL. The warehouse-history
    * primitive behind every dimension table that answers "what was
    * this user's state at time T". Three per-user window passes
    * (change detection via lag, run numbering via running sum, close
    * via lead) and one grouped agg — all partitioned by user_id, so
    * at 100 TB each pass is one co-partitioned shuffle and no user's
    * history ever leaves its partition between them (Spark reuses
    * the (user_id)-hash exchange across the window stack). State
    * within a run is constant, so min() reads it deterministically. */
  def scd2(s: SparkSession, d: String): DataFrame =
    scd2Core(Tables.events(s, d))

  /** Interval construction over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin run compaction
    * and the open current interval by hand. */
  def scd2Core(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(w)
    val runs = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("brk", when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
      .withColumn("run_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wu))
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** First-order transition matrix (E7, r4): per-user event streams
    * in (ts, event_id) order yield (from_type → to_type) bigram
    * counts and row-normalized probabilities — the Markov-chain view
    * of user behavior ("what follows a click?"). One per-user lead()
    * (co-partitioned window, histories never cross partitions), one
    * 25-row grouped count, and the normalizing sum rides as a window
    * over the tiny (from_type) result — event volume touches exactly
    * one shuffle. Probability = count/total is a long/long division
    * both engines lower to the same IEEE double; round(4) is
    * presentation only. */
  def transitions(s: SparkSession, d: String): DataFrame =
    transitionsCore(Tables.events(s, d))

  /** Bigram extraction over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin the counts and
    * the row-normalization by hand. */
  def transitionsCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double"), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Time-weighted average (E8, r4): each event's value holds until
    * the user's next event; TWAP = Σ(value·Δt) / Σ(Δt) per user —
    * the metrics/finance aggregate where a value held for 6 hours
    * must count 6× more than one held for a minute (the plain AVG
    * over-weights bursts). Δt comes from one per-user lead() in
    * exact integer MICROSECONDS (unix_micros — both engines derive
    * bit-identical longs; the span sum stays integer-exact at any
    * scale), the last event carries no duration and drops out. The
    * ratio's numerator is a double sum whose ~1e-14 relative
    * summation-order noise is crushed by the integer-exact
    * denominator before round(4). One window pass + one agg, both
    * keyed by user_id. */
  def twap(s: SparkSession, d: String): DataFrame =
    twapCore(Tables.events(s, d))

  /** Segment weighting over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin the
    * hold-until-next semantics by hand. */
  def twapCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("dt_us", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dt_us")).as("span_us"),
        round(sum(col("value") * col("dt_us")) /
          sum(col("dt_us")).cast("double"), 4).as("twap"))
      .orderBy(col("user_id"))
  }

  /** Consecutive-day activity streaks (E9, r4): the classic
    * gaps-and-islands trick — within each user's sorted distinct
    * active days, `day − row_number()` is constant exactly across a
    * run of consecutive dates, so one grouped count per (user, island)
    * yields run lengths with NO self-join and no iteration. Engagement
    * metrics ("longest streak", "how fragmented is activity") at the
    * cost of one distinct + one co-partitioned window + two aggs; the
    * distinct collapses event volume to user-days before anything
    * else runs. */
  def streaks(s: SparkSession, d: String): DataFrame =
    streaksCore(Tables.events(s, d))

  /** Island detection over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin run splitting
    * across a gap by hand. */
  def streaksCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  /** Interval concurrency via temporal gridding (E10, r4): how many
    * user sessions are simultaneously open at each hourly tick — the
    * capacity-planning gauge. Sessions come from the same
    * gaps-and-islands relation as ST3; each interval [start, end)
    * then EXPLODES to exactly the hour ticks it covers (ceil(start)
    * … largest tick < end) and one grouped count per tick does the
    * rest. This is the shuffle-free rendering of a sweep line: the
    * naive form (±1 deltas + one GLOBAL running sum) serializes all
    * events through a single partition, and the containment join
    * (spine ⋈ intervals on s ≤ h < e) has no equi key — gridding
    * turns both into a narrow explode bounded by session-hours, so
    * at 100 TB the cost scales with total session DURATION, not
    * event volume. An empty `sequence` guard (`when(a ≤ b, …)`)
    * drops sub-tick sessions instead of throwing — the chunker's
    * empty-doc lesson. */
  def concurrency(s: SparkSession, d: String): DataFrame =
    concurrencyCore(Tables.events(s, d))

  /** Gridding over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin tick coverage at the boundaries by hand. */
  def concurrencyCore(ev: DataFrame): DataFrame = {
    val hfloor = date_trunc("hour", col("s"))
    val a = when(hfloor === col("s"), col("s"))
      .otherwise(hfloor + expr("INTERVAL 1 HOUR"))
    val b = date_trunc("hour", col("e") - expr("INTERVAL 1 MICROSECOND"))
    Streaming.sessionize(ev)
      .select(col("session_start").as("s"), col("session_end").as("e"))
      .select(explode(when(a <= b, sequence(a, b, expr("INTERVAL 1 HOUR")))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("h"))
  }

  /** Ordered-funnel attribution (event analytics): within each
    * (user, day), the first view, the first click strictly after it,
    * the first purchase strictly after that click — rolled up per
    * ISO week with step conversion rates. Each step is one aggregate
    * plus one equi-join back to the events relation on (user, day)
    * with a range predicate on the previous step's timestamp: at
    * scale all three steps shuffle on the same (user_id, day) key,
    * so AQE plans them as one co-partitioned chain; nothing is
    * quadratic and no window function buffers whole user histories.
    * The strictly-after ordering is what makes it a funnel rather
    * than three independent filters. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), col("ts"))
    def firstAfter(prev: DataFrame, prevTs: String, kind: String, outTs: String) =
      e.filter(col("event_type") === kind)
        .join(prev, Seq("user_id", "day"))
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id"), col("day"))
        .agg(min(col("ts")).as(outTs))
    val viewed = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("t_view"))
    val clicked = firstAfter(viewed, "t_view", "click", "t_click")
    val purchased = firstAfter(clicked, "t_click", "purchase", "t_purchase")
    def weekly(df: DataFrame, name: String) =
      df.groupBy(trunc(col("day"), "week").as("week"))
        .agg(count(lit(1)).as(name))
    weekly(viewed, "n_viewed")
      .join(weekly(clicked, "n_clicked"), Seq("week"), "left")
      .join(weekly(purchased, "n_purchased"), Seq("week"), "left")
      .select(col("week"),
        col("n_viewed"),
        coalesce(col("n_clicked"), lit(0L)).as("n_clicked"),
        coalesce(col("n_purchased"), lit(0L)).as("n_purchased"),
        round(coalesce(col("n_clicked"), lit(0L)) / col("n_viewed"), 4).as("view_to_click"),
        coalesce(round(col("n_purchased") / col("n_clicked"), 4), lit(0.0)).as("click_to_buy"))
      .orderBy(col("week"))
  }

  /** Cohort retention (event analytics): users cohorted by the ISO
    * week of their first event; each later active week counts toward
    * (cohort_week, week_offset). The cohort relation is one row PER
    * USER — deliberately NOT broadcast (at corpus scale it is as big
    * as the user base); both sides hash-join on user_id. Shuffle
    * budget: distinct on (user, week), cohort agg + join re-key on
    * user, final rollup on (cohort, offset) — each moves one narrow
    * row per user-week, never raw events. The classic retention
    * triangle, fully deterministic. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), trunc(to_date(col("ts")), "week").as("w"))
    val activity = e.distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("w")).as("cohort_week"))
    activity.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** CEP-style sequence match (E13, r4): for every view, did the same
    * user click within the following hour? — the A-followed-by-B-
    * within-Δt existence pattern that SQL MATCH_RECOGNIZE / CEP
    * engines sell, rendered as the house band shape ([[attribution]],
    * J6 as-of): user-equi anchor + (0, 1h] residual, candidates
    * bounded by per-user activity, never event². Per-view existence
    * folds in the first aggregate (LEFT join keeps unmatched views;
    * `max(candidate IS NOT NULL)` is order-free), the per-user rollup
    * divides exact integers. Both aggregates partition by user-
    * prefixed keys, so the exchange is planned once. */
  def seqMatch(s: SparkSession, d: String): DataFrame =
    seqMatchCore(Tables.events(s, d))

  /** Sequence match over any events relation — DataFrame-
    * parameterized so AnalyticsSpec can pin the strict (0, 1h]
    * window and the unmatched-view denominators by hand. */
  def seqMatchCore(ev: DataFrame): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    views
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") > col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOURS"),
        "left_outer")
      .groupBy(col("user_id"), col("view_id"))
      .agg(max(when(col("click_ts").isNotNull, 1).otherwise(0)).as("matched"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_views"),
        sum(col("matched")).cast("long").as("n_matched"))
      .withColumn("match_rate",
        round(col("n_matched") / col("n_views").cast("double"), 6))
      .orderBy(col("user_id"))
  }

  /** Maximum drawdown (E14, r4): per user, the deepest gap between
    * the running peak of `value` and the value itself over the
    * (ts, event_id)-ordered stream, with the trough row that realized
    * it — the risk metric behind "how far under the high-water mark
    * did this series fall". Running max, the subtraction, and the
    * (dd desc, ts desc, event_id desc) pick all operate on EXACT raw
    * doubles (no sums anywhere), so both engines rank identical
    * numbers and rounding appears only in the output rendering. One
    * user-partition window stack, exchange planned once. */
  def drawdown(s: SparkSession, d: String): DataFrame =
    drawdownCore(Tables.events(s, d))

  /** Drawdown over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin peak tracking and the trough tiebreak by
    * hand. */
  def drawdownCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dd = ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("peak", max(col("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dd", col("peak") - col("value"))
    dd.withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("dd").desc, col("ts").desc, col("event_id").desc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), round(col("dd"), 4).as("max_drawdown"),
        col("ts").as("trough_ts"), col("event_id").as("trough_event"),
        round(col("peak"), 4).as("peak_value"))
      .orderBy(col("user_id"))
  }

  /** Incremental aggregate maintenance (E15, r4): the materialized-
    * view maintenance contract — agg(base) ⊕ agg(delta) must equal
    * agg(base ∪ delta). The engine path maintains per-(type, hour)
    * counts incrementally: base snapshot and delta changelog ([[
    * mergeUpsertCore]]'s integer-microsecond midpoint split) aggregate
    * SEPARATELY and merge by full-outer coalesce-sum — at 100 TB the
    * base aggregate is a stored table and only the delta touches new
    * data, which is the entire point of view maintenance. The ORACLE
    * deliberately computes the DIRECT aggregation over the union —
    * a different plan proving the same numbers, so the hash compare
    * checks the maintenance algebra itself, not a shared rendering. */
  def incrAgg(s: SparkSession, d: String): DataFrame =
    incrAggCore(Tables.events(s, d))

  /** Maintenance over any events relation — DataFrame-parameterized
    * so AnalyticsSpec can pin the three merge cases (base-only hour,
    * delta-only hour, straddling hour) by hand. */
  def incrAggCore(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      date_trunc("hour", col("ts")).as("h"), unix_micros(col("ts")).as("us"))
    val mid = ev.agg(((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid_us"))
    val st = ev.crossJoin(broadcast(mid))
    def counts(side: DataFrame, name: String) =
      side.groupBy(col("event_type"), col("h")).agg(count(lit(1)).as(name))
    counts(st.filter(col("us") <= col("mid_us")), "n_base")
      .join(counts(st.filter(col("us") > col("mid_us")), "n_delta"),
        Seq("event_type", "h"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_delta"))
      .select(col("event_type"), col("h"),
        (col("n_base") + col("n_delta")).as("n_total"),
        col("n_base"), col("n_delta"))
      .orderBy(col("event_type"), col("h"))
  }

  /** RFM segmentation (E16, r4): recency / frequency / monetary
    * quartile scores per purchasing user WITHIN the user's first-
    * event month cohort — the classic CRM segmentation ("432" =
    * recent, frequent, low-spend), cohort-scoped both for semantics
    * (users are quartiled against contemporaries, not against
    * accounts created years earlier) and for scale (every ntile
    * window partitions by cohort — a GLOBAL ntile is the
    * single-partition window trap at a billion users). Monetary is
    * ROUNDED (2 dp) BEFORE ranking so the quartile order ranks
    * cross-engine-identical numbers; every ntile orders by
    * (metric, user_id) — a total order, and ANSI ntile's
    * earlier-buckets-larger distribution is shared by both engines.
    * Event volume crosses two user-keyed rollups (one planned
    * exchange pair); the rank windows run over user cardinality. */
  def rfm(s: SparkSession, d: String): DataFrame =
    rfmCore(Tables.events(s, d))

  /** RFM over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin quartile edges, cohort isolation, and the
    * segment string. */
  def rfmCore(events: DataFrame): DataFrame = {
    val cohort = events.groupBy(col("user_id"))
      .agg(date_trunc("month", min(col("ts"))).as("cohort"))
    val per = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("f"),
        round(sum(col("value")), 2).as("m"))
    def score(c: String) = ntile(4).over(
      Window.partitionBy(col("cohort")).orderBy(col(c).desc, col("user_id")))
    per.join(cohort, Seq("user_id"))
      .withColumn("r_score", score("last_ts"))
      .withColumn("f_score", score("f"))
      .withColumn("m_score", score("m"))
      .withColumn("segment", concat(col("r_score"), col("f_score"), col("m_score")))
      .select(col("user_id"), col("cohort"), col("last_ts"), col("f"), col("m"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy(col("user_id"))
  }

  /** Conversion latency profile (E17, r4): how long a view takes to
    * convert — per ISO weekday of the view, the distribution of each
    * converting view's time to its FIRST purchase within 24 h
    * (n, min, discrete median, discrete p90, max, in seconds). The
    * candidate stream is the house band shape ([[seqMatch]]); the
    * per-view first purchase is a min() fold; latencies are exact
    * integer MICROSECONDS end to end, and the quantiles are
    * rank-and-filter discrete values over the weekday partition (7
    * groups — the same partitioned-window class as the per-flag
    * quantile queries; a global quantile would be the
    * single-partition trap), so nothing floats until the final
    * seconds rendering. Weekday = Spark `weekday()+1` == DuckDB
    * `isodow` (1 = Monday — Spark's `dayofweek` counts from Sunday
    * and would silently shift every group). */
  def convertLatency(s: SparkSession, d: String): DataFrame =
    convertLatencyCore(Tables.events(s, d))

  /** Latency profile over any events relation — DataFrame-
    * parameterized so AnalyticsSpec can pin first-purchase selection,
    * the 24 h horizon, and the discrete ranks by hand. */
  def convertLatencyCore(ev: DataFrame): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"), (weekday(col("ts")) + 1).as("dow"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("buy_ts"))
    val lat = views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") > col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("dow"), col("view_id"))
      .agg(min(unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("dt_us"))
    val w = Window.partitionBy(col("dow"))
    lat
      .withColumn("rn", row_number().over(w.orderBy(col("dt_us"), col("view_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_converted"),
        round(min(col("dt_us")) / lit(1000000.0), 2).as("min_s"),
        round(max(when(col("rn") === ceil(col("n") * 0.5), col("dt_us"))) / lit(1000000.0), 2).as("med_s"),
        round(max(when(col("rn") === ceil(col("n") * 0.9), col("dt_us"))) / lit(1000000.0), 2).as("p90_s"),
        round(max(col("dt_us")) / lit(1000000.0), 2).as("max_s"))
      .orderBy(col("dow"))
  }

  /** Composed event-analytics flagship (E26, r5): sessionize →
    * per-session stats → weekly conversion funnel, ONE declared query
    * chaining three operators the engine ships separately (the
    * lag-gap-cumsum sessionization of ST6's batch face, the E16-style
    * session rollup, the E1-family conversion readout) — the
    * events-side sibling of q_pipeline_corpus. The rollup keys on the
    * SESSION's week, not a user cohort: on this corpus every user is
    * active from day one, so first-touch cohorting degenerates to one
    * row (and E2 already owns cohort retention).
    *
    * Shuffle discipline: sessionization flags, the running session
    * index, and the session rollup all ride ONE user_id exchange (the
    * (user, session) grouping is satisfied by the user hash
    * partitioning); only the ≤|weeks| weekly rollup shuffles again.
    * Conversion = exact integer counts into one division. */
  def pipelineEvents(s: SparkSession, d: String): DataFrame =
    pipelineEventsCore(Tables.events(s, d))

  private[graft] def pipelineEventsCore(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sessions
      .groupBy(date_trunc("week", col("session_start")).cast("date").as("week"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"),
        sum(col("n_events")).as("n_events_total"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_sessions"), 6))
      .orderBy(col("week"))
  }

  /** Cross-correlation of two event streams (E25, r5): Pearson r
    * between the hourly count series of two event types over hours
    * where either fires. The alignment is one conditional aggregation
    * (no join of two per-type rollups — at 100 TB that join re-pays
    * the shuffle the single groupBy already paid), and the corr is
    * computed from the FIVE exact integer moments (n, Σx, Σy, Σxy,
    * Σx², Σy²), not corr()'s streaming doubles: the one division and
    * sqrt at the end are single IEEE ops over exact-integer-valued
    * operands, identical cross-engine. The variance terms cast to
    * double BEFORE their product — n·Σx²·n·Σy² overflows int64 far
    * earlier than either factor. Each centered term n·Σx² − Σx²
    * is itself int64 arithmetic, exact while hours × peak-hour
    * count ≲ 3×10⁹ (n·Σx² < 2⁶³ needs n·C ≤ 3.03e9 for peak count
    * C) — comfortably a decade of hours at millions of events/hour,
    * but a ceiling, not unconditional: past it the moments must move
    * to DECIMAL (Spark wraps silently where DuckDB raises). */
  def crossCorr(s: SparkSession, d: String): DataFrame =
    crossCorrCore(Tables.events(s, d), "click", "view")

  private[graft] def crossCorrCore(ev: DataFrame, a: String,
      b: String): DataFrame = {
    val m = ev.filter(col("event_type").isin(a, b))
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(when(col("event_type") === a, 1)).as("x"),
        count(when(col("event_type") === b, 1)).as("y"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    m.withColumn("pearson_r", round(
      (col("n_hours") * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((col("n_hours") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n_hours") * col("syy") - col("sy") * col("sy")).cast("double")),
      6))
      .orderBy(col("n_hours"))
  }

  /** Rolling z-score anomaly detection (E18, r5): each event scored
    * against its user's trailing 20 observations — the streaming-ish
    * outlier gauge ("is THIS value weird for THIS user?") that a
    * per-user global z (A8) can't express. One co-partitioned window
    * pass; at 100 TB the only shuffle is the (user_id) hash partition
    * the other per-user windows already pay.
    *
    * Cross-engine contract: sliding-frame SUMS of doubles are NOT
    * portable (Spark slides by add/remove updates, DuckDB by segment
    * tree — different accumulation orders), so value quantizes to
    * exact 1e-4 integer units FIRST (floor of one IEEE multiply —
    * identical on both engines) and every frame statistic is integer
    * arithmetic until the single final division: z = (n·x − Σx) /
    * √(n·Σx² − (Σx)²), all operands exact longs (bounded: |u| ≤ 5.7e6
    * at the harness value range, n ≤ 20 ⇒ n·Σx² ≤ 1.3e16 < 2⁶³).
    * Flat-history frames (variance 0) can't be scored and drop. */
  def rollingZscore(s: SparkSession, d: String): DataFrame =
    rollingZscoreCore(Tables.events(s, d))

  /** Trailing-frame scoring over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin the frame
    * arithmetic on a hand-built history. */
  def rollingZscoreCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    ev.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("u", floor(col("value") * 10000).cast("long"))
      .withColumn("n", count(col("u")).over(w))
      .withColumn("sx", sum(col("u")).over(w))
      .withColumn("sxx", sum(col("u") * col("u")).over(w))
      .filter(col("n") >= 5 && (col("n") * col("sxx") > col("sx") * col("sx")))
      .withColumn("z", (col("n") * col("u") - col("sx")).cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        round(col("z"), 4).as("z"), (abs(col("z")) > 2.0).as("is_anomaly"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Seasonal anomaly screen (E-family extension): flag events whose
    * value sits more than 3σ from the mean of their OWN seasonal cell
    * (event_type × hour-of-day) — the baseline shape monitoring
    * pipelines run before any model-based detector, where
    * [[rollingZscoreCore]]'s trailing frame catches per-user drift
    * this catches "a checkout worth 10× what checkouts are worth at
    * 3am". Determinism is the integer-moments-divided-first contract
    * ([[rollingZscoreCore]] + the assortativity mean form): values
    * quantize to cents (u = floor(value·100) ≤ 5.7e6 here, so with
    * u² ≤ 3.3e13 the Σu² moment fits int64 up to ~2.8×10⁵
    * MAX-VALUE rows per cell — the honest ceiling; past it Spark
    * wraps silently while DuckDB raises, so a bigger corpus must
    * move sxx to DECIMAL(38,0) before this screen is trusted), the
    * cell's n/Σu/Σu² are exact order-free longs within that bound,
    * and both engines then run the identical
    * IEEE tree mean = sx/n, var = sxx/n − mean², z = (u−mean)/√var —
    * bit-identical doubles, so the strict |z| > 3 cut cannot straddle
    * engines. Scale: one bounded rollup (≤ types·24 cells broadcast
    * back over the fact), no window over the fact, no collect. */
  def seasonalAnomaly(s: SparkSession, d: String): DataFrame =
    seasonalAnomalyCore(Tables.events(s, d))

  /** Screen over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin the moment arithmetic on a hand-built
    * cell. */
  def seasonalAnomalyCore(ev: DataFrame): DataFrame = {
    val e = ev.select(col("event_id"), col("event_type"),
      hour(col("ts")).as("hr"), col("value"),
      floor(col("value") * 100).cast("long").as("u"))
    val cells = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sx"),
        sum(col("u") * col("u")).as("sxx"))
      .filter(col("n") >= 30)
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("variance",
        col("sxx").cast("double") / col("n") - col("mean") * col("mean"))
      .filter(col("variance") > 0)
      .select(col("event_type").as("ct"), col("hr").as("chr"),
        col("mean"), col("variance"))
    e.join(broadcast(cells),
        col("event_type") === col("ct") && col("hr") === col("chr"))
      .withColumn("z", (col("u") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("hr"),
        round(col("value"), 2).as("value"), round(col("z"), 4).as("z"))
      .orderBy(col("event_id"))
  }

  /** Cumulative distinct users by day (E19, r5): daily actives, daily
    * FIRST-SEEN users, and the running total of distinct users ever
    * seen — the growth-accounting readout. Running COUNT(DISTINCT) is
    * not a window Spark (or any shuffle engine) can stream, and the
    * textbook trick makes it linear: a user contributes to exactly one
    * day (their min), so cumulative distinct = running SUM of
    * first-seen counts. Two hash shuffles over the user-day distinct
    * (day rollup + user min); the one unpartitioned running-sum window
    * sits on the joined per-day aggregates — a calendar-bounded
    * relation (the PlanSpec window gate's post-aggregation case). */
  def cumulativeDistinct(s: SparkSession, d: String): DataFrame =
    cumulativeDistinctCore(Tables.events(s, d))

  /** Growth accounting over any events relation —
    * DataFrame-parameterized so AnalyticsSpec can pin the first-seen
    * attribution by hand. */
  def cumulativeDistinctCore(ev: DataFrame): DataFrame = {
    val dayUsers = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val active = dayUsers.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val firstSeen = dayUsers.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    active.join(firstSeen, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new")).over(
        Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("day"), col("n_active"), col("n_new"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** Trailing 7-day rolling active users (E20, r5): distinct users
    * active in [d−6, d] for every observed day — the DAU/WAU family's
    * WAU curve. A rolling window cannot deduplicate users across days,
    * so the shape is: collapse events to the (user, day) distinct,
    * then a bounded band join against the OBSERVED-day dim (calendar-
    * bounded, explicitly broadcast — each user-day lands in ≤ 7 target
    * days, the q_mix_epochs bounded-inequality precedent), re-distinct
    * on (target day, user), one rollup. At 100 TB cost scales with
    * user-days × 7, never event volume — the first distinct collapses
    * raw events before anything widens. */
  def rollingActive(s: SparkSession, d: String): DataFrame =
    rollingActiveCore(Tables.events(s, d))

  /** WAU banding over any events relation — DataFrame-parameterized
    * so AnalyticsSpec can pin the window membership at the 7-day
    * boundary by hand. */
  def rollingActiveCore(ev: DataFrame): DataFrame = {
    val dayUsers = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = dayUsers.select(col("day").as("d")).distinct()
    dayUsers.join(broadcast(days),
        col("day") <= col("d") && col("day") >= date_sub(col("d"), 6))
      .select(col("d"), col("user_id")).distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("n_active_7d"))
      .orderBy(col("d"))
  }

  /** Per-user inter-arrival profile (r5 wave 19): the engagement-
    * cadence readout — for every user with ≥ 2 events, the count,
    * min/max/mean gap between consecutive events, all in EXACT
    * integer microseconds (unix_micros differences; the mean is an
    * integer floor-div, so no double summation order or .5-tie can
    * diverge cross-engine), plus a burstiness flag (min gap under a
    * minute while the mean exceeds an hour). One user-partitioned lag
    * window + one rollup on the SAME key — the window's exchange
    * satisfies the groupBy's distribution, so the whole profile is a
    * single shuffle at any event volume. */
  def interarrival(s: SparkSession, d: String): DataFrame =
    interarrivalCore(Tables.events(s, d))

  /** Profile over any events relation — DataFrame-parameterized so
    * AnalyticsSpec can pin the gap arithmetic and the single-event
    * dropout by hand. */
  def interarrivalCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        expr("sum(gap_us) div count(*)").as("avg_gap_us"))
      .withColumn("bursty",
        col("min_gap_us") < 60L * 1000000L && col("avg_gap_us") > 3600L * 1000000L)
      .orderBy(col("user_id"))
  }

  /** Snapshot reconciliation diff (r5 wave 22): the data-engineering
    * "what changed between loads" readout — per-user activity in the
    * first vs second half of the month, reconciled by FULL OUTER
    * join into added / removed / changed / same. Value mass is exact
    * integer cents (decimal sum → long), so `changed` is an exact
    * integer comparison, never a double epsilon; the join's null
    * sides are the classification signal (the one join type the
    * engine's J4 family didn't yet declare). One shuffle per
    * half-aggregate + the user-keyed join. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame =
    snapshotDiffCore(Tables.events(s, d))

  def snapshotDiffCore(ev: DataFrame): DataFrame = {
    val mid = lit("2024-01-16 00:00:00").cast("timestamp")
    def half(pred: Column, pfx: String) = ev.filter(pred)
      .groupBy(col("user_id").as(s"${pfx}_uid"))
      .agg(count(lit(1)).as(s"${pfx}_n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
          .as(s"${pfx}_cents"))
    half(col("ts") < mid, "a")
      .join(half(col("ts") >= mid, "b"), col("a_uid") === col("b_uid"), "full_outer")
      .select(
        coalesce(col("a_uid"), col("b_uid")).as("user_id"),
        coalesce(col("a_n"), lit(0L)).as("n_first"),
        coalesce(col("b_n"), lit(0L)).as("n_second"),
        col("a_cents"), col("b_cents"),
        when(col("a_uid").isNull, "added")
          .when(col("b_uid").isNull, "removed")
          .when(col("a_cents") === col("b_cents"), "same")
          .otherwise("changed").as("status"))
      .orderBy(col("user_id"))
  }

  /** Hopping trending top-k (r5 wave 22): the dashboard staple — per
    * day, the 3 most frequent event types with a total-order tiebreak
    * (count desc, type asc). The rank window partitions by day over
    * the POST-aggregation (day × type) relation — bounded at
    * |days|·|types| rows, so the window never touches event volume;
    * the one wide op over facts is the (day, type) count, which is
    * map-side combinable. */
  def trending(s: SparkSession, d: String): DataFrame =
    trendingCore(Tables.events(s, d))

  def trendingCore(ev: DataFrame): DataFrame = {
    val byDay = Window.partitionBy(col("day"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    ev.select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rnk", row_number().over(byDay))
      .filter(col("rnk") <= 3)
      .orderBy(col("day"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cross_corr"      -> crossCorr,
    "q_pipeline_events" -> pipelineEvents,
    "q_snapshot_diff"   -> snapshotDiff,
    "q_trending"        -> trending,
    "q_interarrival"    -> interarrival,
    "q_rolling_zscore"  -> rollingZscore,
    "q_seasonal_anom"   -> seasonalAnomaly,
    "q_cume_distinct"   -> cumulativeDistinct,
    "q_rolling_active"  -> rollingActive,
    "q_convert_latency" -> convertLatency,
    "q_rfm"             -> rfm,
    "q_incr_agg"        -> incrAgg,
    "q_drawdown"        -> drawdown,
    "q_seq_match"       -> seqMatch,
    "q_attribution"     -> attribution,
    "q_attribution_decay" -> attributionDecay,
    "q_churn_labels"    -> churnLabels,
    "q_path_mining"     -> pathMining,
    "q_merge_upsert"    -> mergeUpsert,
    "q_scd2"            -> scd2,
    "q_transitions"     -> transitions,
    "q_twap"            -> twap,
    "q_streaks"         -> streaks,
    "q_concurrency"     -> concurrency,
    "q_funnel"          -> funnel,
    "q_retention"       -> retention,
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding"  -> streamSliding,
    "q_stream_session"  -> streamSession,
    "q_stream_dedup"    -> streamDedup,
    "q_stream_retract"  -> streamRetract,
    "q_stream_ivm"      -> streamIvm,
    "q_stream_watermark" -> streamWatermark,
    "q_stream_stateful" -> streamStateful,
    "q_stream_join"     -> streamJoin,
    "q_stream_join_outer" -> streamJoinOuter,
    "q_stream_enrich"   -> streamEnrich,
    "q_densify"         -> densify,
    "q_compact_latest"  -> compactLatest,
  )

  val oracles: Map[String, String] = Map(
    // same lag-gap-cumsum sessionization, same (ts, event_id) order,
    // same exact integer conversion counts
    "q_pipeline_events" ->
      """WITH f AS (SELECT user_id, ts, event_id, event_type,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         g AS (SELECT *, CASE WHEN prev_ts IS NULL
             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             THEN 1 ELSE 0 END AS is_new FROM f),
         h AS (SELECT *,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
         sess AS (SELECT user_id, session_idx,
           min(ts) AS session_start,
           count(*) AS n_events,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS converted
           FROM h GROUP BY 1, 2)
         SELECT date_trunc('week', session_start) AS week,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(n_events) AS BIGINT) AS n_events_total,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conv_rate
         FROM sess GROUP BY 1 ORDER BY week""",
    // same five exact integer moments, same double-before-product
    "q_cross_corr" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS h,
           count(*) FILTER (event_type = 'click') AS x,
           count(*) FILTER (event_type = 'view') AS y
           FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy FROM h)
         SELECT n_hours, sx, sy, sxy, sxx, syy,
           round(CAST(n_hours * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE) *
                  CAST(n_hours * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
         FROM m ORDER BY n_hours""",
    // exact integer cents both sides of the FULL OUTER reconciliation
    "q_snapshot_diff" ->
      """WITH a AS (SELECT user_id AS a_uid, count(*) AS a_n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS a_cents
           FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
           GROUP BY user_id),
         b AS (SELECT user_id AS b_uid, count(*) AS b_n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS b_cents
           FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
           GROUP BY user_id)
         SELECT coalesce(a_uid, b_uid) AS user_id,
           coalesce(a_n, 0) AS n_first, coalesce(b_n, 0) AS n_second,
           a_cents, b_cents,
           CASE WHEN a_uid IS NULL THEN 'added'
                WHEN b_uid IS NULL THEN 'removed'
                WHEN a_cents = b_cents THEN 'same'
                ELSE 'changed' END AS status
         FROM a FULL OUTER JOIN b ON a_uid = b_uid
         ORDER BY user_id""",
    "q_trending" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type,
           count(*) AS n_events
           FROM events GROUP BY 1, 2),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY day
           ORDER BY n_events DESC, event_type) AS INT) AS rnk FROM c)
         SELECT day, event_type, n_events, rnk FROM r
         WHERE rnk <= 3 ORDER BY day, rnk""",
    // exact integer micros; mean is an integer floor-div
    "q_interarrival" ->
      """WITH g AS (SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts), 1)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT user_id, count(*) AS n_gaps,
           min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) // count(*) AS avg_gap_us,
           min(gap_us) < 60000000 AND
             (CAST(sum(gap_us) AS BIGINT) // count(*)) > 3600000000 AS bursty
         FROM g WHERE gap_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    // same 1e-4 integer quantization, same exact-integer frame sums,
    // same single division — see the engine-side portability comment
    "q_rolling_zscore" ->
      """WITH x AS (SELECT user_id, event_id, ts, value,
             CAST(floor(value * 10000) AS BIGINT) AS u FROM events),
         w AS (SELECT user_id, event_id, value, u,
             count(u) OVER win AS n,
             sum(u) OVER win AS sx,
             sum(u * u) OVER win AS sxx
           FROM x
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id, round(value, 2) AS value,
           round((n * u - sx) / sqrt(n * sxx - sx * sx), 4) AS z,
           abs((n * u - sx) / sqrt(n * sxx - sx * sx)) > 2.0 AS is_anomaly
         FROM w WHERE n >= 5 AND n * sxx > sx * sx
         ORDER BY user_id, event_id""",
    // same cent quantization, same exact cell moments, same
    // divided-first IEEE tree — z is bit-identical, so the strict
    // |z| > 3 cut agrees by construction
    "q_seasonal_anom" ->
      """WITH e AS (SELECT event_id, event_type,
             CAST(hour(ts) AS INT) AS hr, value,
             CAST(floor(value * 100) AS BIGINT) AS u FROM events),
         st AS (SELECT event_type, hr, count(*) AS n,
                  CAST(sum(u) AS BIGINT) AS sx,
                  CAST(sum(u * u) AS BIGINT) AS sxx
                FROM e GROUP BY event_type, hr),
         m AS (SELECT event_type, hr,
                 CAST(sx AS DOUBLE) / n AS mean,
                 CAST(sxx AS DOUBLE) / n -
                   (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS variance
               FROM st WHERE n >= 30)
         SELECT event_id, e.event_type, e.hr, round(value, 2) AS value,
           round((u - mean) / sqrt(variance), 4) AS z
         FROM e JOIN m ON m.event_type = e.event_type AND m.hr = e.hr
         WHERE variance > 0 AND abs((u - mean) / sqrt(variance)) > 3.0
         ORDER BY event_id""",
    // cumulative distinct = running sum of first-seen counts (a user
    // contributes to exactly one day: their min)
    "q_cume_distinct" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         act AS (SELECT day, count(*) AS n_active FROM du GROUP BY day),
         fs AS (SELECT day, count(*) AS n_new FROM (
                  SELECT user_id, min(day) AS day FROM du GROUP BY user_id)
                GROUP BY day)
         SELECT act.day, act.n_active, coalesce(fs.n_new, 0) AS n_new,
           CAST(sum(coalesce(fs.n_new, 0)) OVER (ORDER BY act.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
         FROM act LEFT JOIN fs ON act.day = fs.day
         ORDER BY act.day""",
    // same bounded band join against the observed-day dim
    "q_rolling_active" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day AS d FROM du)
         SELECT d, count(*) AS n_active_7d FROM (
           SELECT DISTINCT days.d, du.user_id
           FROM du JOIN days ON du.day <= days.d AND du.day >= days.d - 6)
         GROUP BY d ORDER BY d""",
    // same band candidates, same first-purchase min fold, same
    // integer-microsecond discrete ranks, same isodow grouping
    "q_convert_latency" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts,
             CAST(isodow(ts) AS INT) AS dow
           FROM events WHERE event_type = 'view'),
         b AS (SELECT user_id AS b_user, ts AS buy_ts
           FROM events WHERE event_type = 'purchase'),
         lat AS (SELECT dow, view_id,
             min(epoch_us(buy_ts) - epoch_us(view_ts)) AS dt_us
           FROM v JOIN b ON b.b_user = v.user_id
             AND b.buy_ts > v.view_ts
             AND b.buy_ts <= v.view_ts + INTERVAL 24 HOUR
           GROUP BY dow, view_id),
         r AS (SELECT dow, dt_us,
             row_number() OVER (PARTITION BY dow ORDER BY dt_us, view_id) AS rn,
             count(*) OVER (PARTITION BY dow) AS n
           FROM lat)
         SELECT dow, CAST(count(*) AS BIGINT) AS n_converted,
           round(min(dt_us) / 1000000.0, 2) AS min_s,
           round(max(CASE WHEN rn = ceil(n * 0.5) THEN dt_us END) / 1000000.0, 2) AS med_s,
           round(max(CASE WHEN rn = ceil(n * 0.9) THEN dt_us END) / 1000000.0, 2) AS p90_s,
           round(max(dt_us) / 1000000.0, 2) AS max_s
         FROM r GROUP BY dow ORDER BY dow""",
    // same cohort assignment, same rounded-before-rank monetary, same
    // (metric desc, user_id) ntile orders
    "q_rfm" ->
      """WITH cohort AS (SELECT user_id,
             CAST(date_trunc('month', min(ts)) AS TIMESTAMP) AS cohort
           FROM events GROUP BY user_id),
         per AS (SELECT user_id, max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS f, round(sum(value), 2) AS m
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT per.user_id, cohort, last_ts, f, m,
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY last_ts DESC, per.user_id) AS INT) AS r_score,
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY f DESC, per.user_id) AS INT) AS f_score,
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY m DESC, per.user_id) AS INT) AS m_score,
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY last_ts DESC, per.user_id) AS VARCHAR) ||
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY f DESC, per.user_id) AS VARCHAR) ||
           CAST(ntile(4) OVER (PARTITION BY cohort ORDER BY m DESC, per.user_id) AS VARCHAR) AS segment
         FROM per JOIN cohort ON per.user_id = cohort.user_id
         ORDER BY per.user_id""",
    // DELIBERATELY a different plan: the direct aggregation over the
    // union — the hash compare proves the engine's incremental merge
    // reproduces it (the view-maintenance algebra, not a shared
    // rendering)
    "q_incr_agg" ->
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events)
         SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN epoch_us(ts) <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN epoch_us(ts) > mid THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
         FROM events CROSS JOIN m
         GROUP BY event_type, date_trunc('hour', ts)
         ORDER BY event_type, h""",
    // same running peak on raw doubles, same trough tiebreak
    "q_drawdown" ->
      """WITH dd AS (SELECT user_id, ts, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM events),
         x AS (SELECT user_id, ts, event_id, peak, peak - value AS d,
             row_number() OVER (PARTITION BY user_id
               ORDER BY peak - value DESC, ts DESC, event_id DESC) AS rk
           FROM dd)
         SELECT user_id, round(d, 4) AS max_drawdown, ts AS trough_ts,
           event_id AS trough_event, round(peak, 4) AS peak_value
         FROM x WHERE rk = 1 ORDER BY user_id""",
    // same band join, same per-view existence fold, same exact-integer
    // rate division
    "q_seq_match" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id AS c_user, ts AS click_ts
           FROM events WHERE event_type = 'click'),
         m AS (SELECT v.user_id, v.view_id,
             max(CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END) AS matched
           FROM v LEFT JOIN c ON c.c_user = v.user_id
             AND c.click_ts > v.view_ts
             AND c.click_ts <= v.view_ts + INTERVAL 1 HOUR
           GROUP BY v.user_id, v.view_id)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
           CAST(sum(matched) AS BIGINT) AS n_matched,
           round(sum(matched) / CAST(count(*) AS DOUBLE), 6) AS match_rate
         FROM m GROUP BY user_id ORDER BY user_id""",
    // same three strictly-ordered steps; left joins keep months whose
    // later steps are empty, rates guarded the same way
    "q_attribution" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click'),
         b AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT c.click_id, c.user_id, b.purchase_id, b.value
               FROM c JOIN b ON c.user_id = b.user_id
                AND c.click_ts <= b.purchase_ts
                AND b.purchase_ts <= c.click_ts + INTERVAL 24 HOUR),
         w AS (SELECT click_id, user_id,
                      value / count(*) OVER (PARTITION BY purchase_id) AS credit
               FROM t)
         SELECT click_id, user_id, count(*) AS n_purchases,
                round(sum(credit), 4) AS attributed
         FROM w GROUP BY click_id, user_id ORDER BY click_id""",
    // same exact-integer midpoint split, same cent quantization, same
    // day floor-division; label absence IS the label
    "q_churn_labels" ->
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
                    FROM events),
         f AS (SELECT user_id, count(*) AS n_events,
                 count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
                 CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents,
                 max(epoch_us(ts)) AS last_us
               FROM events CROSS JOIN m
               WHERE epoch_us(ts) < mid GROUP BY user_id),
         l AS (SELECT DISTINCT user_id FROM events CROSS JOIN m
               WHERE epoch_us(ts) >= mid)
         SELECT f.user_id, n_events, n_active_days, value_cents,
                CAST((mid - last_us) // 86400000000 AS BIGINT) AS days_silent,
                l.user_id IS NULL AS churned
         FROM f CROSS JOIN m LEFT JOIN l ON l.user_id = f.user_id
         ORDER BY f.user_id""",
    // same dyadic weight units (16 >> (Δ div 6h)) — integer exact,
    // never a pow() float; same value·wu/Σwu division operands
    "q_attribution_decay" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click'),
         b AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT c.click_id, c.user_id, b.purchase_id, b.value,
                 CAST(16 AS BIGINT) >> CAST(
                   (epoch_us(b.purchase_ts) - epoch_us(c.click_ts))
                     // 21600000000 AS INT) AS wu
               FROM c JOIN b ON c.user_id = b.user_id
                AND c.click_ts <= b.purchase_ts
                AND b.purchase_ts <= c.click_ts + INTERVAL 24 HOUR),
         w AS (SELECT click_id, user_id,
                      value * wu / sum(wu) OVER (PARTITION BY purchase_id) AS credit
               FROM t)
         SELECT click_id, user_id, count(*) AS n_purchases,
                round(sum(credit), 4) AS attributed
         FROM w GROUP BY click_id, user_id ORDER BY click_id""",
    // the ST3 session CTE again; string_agg(ORDER BY) is the oracle
    // rendering of the deterministic struct sort, rn <= 5 of slice
    "q_path_mining" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (
           SELECT user_id, ts, event_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM m),
         r AS (
           SELECT user_id, sid, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
           FROM s),
         p1 AS (
           SELECT user_id, sid, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
           FROM r WHERE rn <= 5 GROUP BY 1, 2),
         p2 AS (SELECT user_id, sid, count(*) AS session_len FROM s GROUP BY 1, 2)
         SELECT path, count(*) AS n_sessions, round(avg(session_len), 4) AS avg_len
         FROM p1 JOIN p2 USING (user_id, sid)
         GROUP BY path ORDER BY path""",
    // same integer-microsecond midpoint split; QUALIFY row_number is
    // the oracle rendering of each side's max(struct) compaction
    "q_merge_upsert" ->
      """WITH ev AS (SELECT user_id, ts, event_id, event_type, value,
                            epoch_us(ts) AS us FROM events),
         m AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev),
         base AS (
           SELECT user_id, ts AS base_ts, event_type AS base_type, value AS base_value
           FROM ev CROSS JOIN m WHERE us <= mid_us
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
         delta AS (
           SELECT user_id, ts AS delta_ts, event_type AS delta_type, value AS delta_value
           FROM ev CROSS JOIN m WHERE us > mid_us
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
         SELECT coalesce(base.user_id, delta.user_id) AS user_id,
                coalesce(delta_ts, base_ts) AS last_ts,
                coalesce(delta_type, base_type) AS last_type,
                coalesce(delta_value, base_value) AS last_value,
                CASE WHEN delta_ts IS NOT NULL AND base_ts IS NOT NULL THEN 'upsert'
                     WHEN base_ts IS NULL THEN 'insert'
                     ELSE 'carry' END AS src
         FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id
         ORDER BY user_id""",
    // same lag/sum/lead pipeline; min(state) reads the run-constant type
    "q_scd2" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         r AS (
           SELECT user_id, ts, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
           FROM m),
         iv AS (
           SELECT user_id, min(event_type) AS state, min(ts) AS valid_from,
                  count(*) AS n_events
           FROM r GROUP BY user_id, run_id)
         SELECT user_id, state, valid_from,
                lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
                n_events
         FROM iv ORDER BY user_id, valid_from""",
    "q_transitions" ->
      """WITH b AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n
               FROM b WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                round(CAST(n AS DOUBLE) /
                      CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
         FROM c ORDER BY from_type, to_type""",
    // integer-microsecond spans; last event per user carries no segment
    "q_twap" ->
      """WITH seg AS (
           SELECT user_id, value,
                  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                    - epoch_us(ts) AS dt_us
           FROM events)
         SELECT user_id, count(*) AS n_segments,
                CAST(sum(dt_us) AS BIGINT) AS span_us,
                round(sum(value * dt_us) / CAST(sum(dt_us) AS DOUBLE), 4) AS twap
         FROM seg WHERE dt_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    // day - row_number() is constant across a consecutive-date run
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         isl AS (
           SELECT user_id,
                  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
           FROM days),
         runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
         FROM runs GROUP BY user_id ORDER BY user_id""",
    // the ST3 session CTE, each interval unrolled to its hour ticks
    "q_concurrency" ->
      """WITH marked AS (
           SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked),
         agg AS (
           SELECT min(ts) AS s, max(ts) + INTERVAL 30 MINUTE AS e
           FROM sess GROUP BY user_id, sid),
         ticks AS (
           SELECT unnest(generate_series(
             CASE WHEN date_trunc('hour', s) = s THEN s
                  ELSE date_trunc('hour', s) + INTERVAL 1 HOUR END,
             date_trunc('hour', e - INTERVAL 1 MICROSECOND),
             INTERVAL 1 HOUR)) AS h
           FROM agg)
         SELECT h, count(*) AS n_sessions FROM ticks GROUP BY h ORDER BY h""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts FROM events),
         v AS (SELECT user_id, day, min(ts) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT e.user_id, e.day, min(e.ts) AS t_click
               FROM e JOIN v ON e.user_id = v.user_id AND e.day = v.day
               WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1, 2),
         p AS (SELECT e.user_id, e.day, min(e.ts) AS t_purchase
               FROM e JOIN c ON e.user_id = c.user_id AND e.day = c.day
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1, 2),
         vm AS (SELECT date_trunc('week', day) AS week, count(*) AS n_viewed
                FROM v GROUP BY 1),
         cm AS (SELECT date_trunc('week', day) AS week, count(*) AS n_clicked
                FROM c GROUP BY 1),
         pm AS (SELECT date_trunc('week', day) AS week, count(*) AS n_purchased
                FROM p GROUP BY 1)
         SELECT CAST(vm.week AS DATE) AS week, n_viewed,
                coalesce(n_clicked, 0) AS n_clicked,
                coalesce(n_purchased, 0) AS n_purchased,
                round(coalesce(n_clicked, 0) / CAST(n_viewed AS DOUBLE), 4) AS view_to_click,
                coalesce(round(n_purchased / CAST(n_clicked AS DOUBLE), 4), 0.0) AS click_to_buy
         FROM vm LEFT JOIN cm ON vm.week = cm.week
                 LEFT JOIN pm ON vm.week = pm.week
         ORDER BY week""",
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
                    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w
              FROM events),
         c AS (SELECT user_id, min(w) AS cohort_week FROM a GROUP BY 1)
         SELECT cohort_week,
                CAST((a.w - c.cohort_week) // 7 AS INT) AS week_offset,
                count(*) AS n_active
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    // window(ts, 1h) aligns to the epoch grid == date_trunc('hour').
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""",
    "q_compact_latest" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
                event_type AS last_type, value AS last_value
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
         ORDER BY user_id""",
    // the maintained view recomputed from scratch: exact-cent sums
    // (the snapshot-diff money convention) + row_number-1 latest row —
    // recompute ≡ the engine's incremental fold is the IVM contract
    "q_stream_ivm" ->
      """WITH v AS (SELECT user_id, ts, event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events),
         a AS (SELECT user_id, count(*) AS n_versions,
               CAST(sum(cents) AS BIGINT) AS sum_cents FROM v GROUP BY user_id)
         SELECT a.user_id, a.n_versions, a.sum_cents,
                v.ts AS last_ts, v.event_id AS last_event_id,
                v.cents AS last_value_cents
         FROM a JOIN v USING (user_id) WHERE v.rn = 1
         ORDER BY user_id""",
    // the retraction stream's batch face: every non-latest version
    // paired with its LEAD successor in the house event-time order
    "q_stream_retract" ->
      """SELECT user_id, ts AS retracted_ts, event_id AS retracted_event,
                value AS retracted_value,
                lead(ts) OVER w AS superseded_ts,
                lead(event_id) OVER w AS superseded_event
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         QUALIFY superseded_ts IS NOT NULL
         ORDER BY user_id, retracted_ts, retracted_event""",
    "q_densify" ->
      """WITH e AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
         counts AS (SELECT h, event_type, count(*) AS n FROM e GROUP BY 1, 2),
         span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
         types AS (SELECT DISTINCT event_type FROM e)
         SELECT hours.h AS h, types.event_type AS event_type,
                CAST(coalesce(counts.n, 0) AS BIGINT) AS n
         FROM hours CROSS JOIN types
         LEFT JOIN counts ON counts.h = hours.h AND counts.event_type = types.event_type
         ORDER BY hours.h, types.event_type""",
    "q_stream_enrich" ->
      """SELECT date_trunc('hour', e.ts) AS ws, c.c_mktsegment AS segment,
         count(*) AS n, round(sum(e.value), 2) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2 ORDER BY ws, segment""",
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
    // unconverted clicks survive as null-extended rows; null purchase
    // ids explicitly first (Spark/DuckDB null-order defaults differ)
    "q_stream_join_outer" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id AS b_user, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts
         FROM c LEFT JOIN p
           ON c.user_id = p.b_user
          AND p.purchase_ts > c.click_ts
          AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
         ORDER BY click_id, purchase_id NULLS FIRST""",
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
