package graft

import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the event-analytics operators — the
  * oracle hash-compare proves Spark == DuckDB, these prove both equal
  * the intended semantics (a shared misreading of "funnel" would pass
  * the oracle; it cannot pass a fixture computed by hand). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("events pipeline: gap boundary splits sessions, conversion counted per session") {
    // user 1: events at 0, 30m (merges — gap NOT strictly greater),
    // 61m (splits: 31m > 30m) with the purchase in session 2;
    // user 2: one unconverted event. → 3 sessions, 1 converted.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:30:00"), 2L, "view"),
      (1L, ts("2024-01-01 11:31:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 12:00:00"), 4L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = ops.Events.pipelineEventsCore(ev).collect()
    assert(r.length == 1, r.mkString)
    val row = r.head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ==
      ((2L, 3L, 1L, 4L)), row.toString) // users, sessions, converted, events
    assert(row.getDouble(5) == math.rint(1.0 / 3.0 * 1e6) / 1e6, row.toString)
  }

  test("cross-corr: hand-solved perfectly-correlated hourly series give r = 1") {
    // hours h1: (x=1, y=2), h2: (x=2, y=4) — y ≡ 2x so r = 1 exactly
    // from the integer moments (n=2, sx=3, sy=6, sxy=10, sxx=5, syy=20).
    val ev = Seq(
      (ts("2024-01-01 01:10:00"), "click"), (ts("2024-01-01 01:20:00"), "view"),
      (ts("2024-01-01 01:30:00"), "view"),
      (ts("2024-01-01 02:10:00"), "click"), (ts("2024-01-01 02:15:00"), "click"),
      (ts("2024-01-01 02:20:00"), "view"), (ts("2024-01-01 02:30:00"), "view"),
      (ts("2024-01-01 02:40:00"), "view"), (ts("2024-01-01 02:50:00"), "view"),
      (ts("2024-01-01 03:00:00"), "error") // other types never enter
    ).toDF("ts", "event_type")
    val r = ops.Events.crossCorrCore(ev, "click", "view").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 3L, 6L, 10L, 5L, 20L)), r.toString)
    assert(r.getDouble(6) == 1.0, r.toString)
  }

  test("snapshot diff: added/removed/changed/same classify on exact cents") {
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 10.00),  // both halves, same cents
      (1L, ts("2024-01-20 00:00:00"), 10.00),
      (2L, ts("2024-01-10 00:00:00"), 10.00),  // both halves, changed
      (2L, ts("2024-01-20 00:00:00"), 10.01),
      (3L, ts("2024-01-20 00:00:00"), 5.00),   // second half only → added
      (4L, ts("2024-01-10 00:00:00"), 5.00)    // first half only → removed
    ).toDF("user_id", "ts", "value")
    val got = ops.Events.snapshotDiffCore(ev).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "added", 4L -> "removed"), got.toString)
  }

  test("trending: top-3 per day with total-order tiebreak") {
    val ev = Seq(
      (ts("2024-01-01 01:00:00"), "b"), (ts("2024-01-01 02:00:00"), "b"),
      (ts("2024-01-01 03:00:00"), "a"), (ts("2024-01-01 04:00:00"), "a"),
      (ts("2024-01-01 05:00:00"), "c"),
      (ts("2024-01-01 06:00:00"), "d")
    ).toDF("ts", "event_type")
    val got = ops.Events.trendingCore(ev).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // counts tie at 2 for a/b → type asc breaks it; c/d tie at 1 →
    // 'c' takes rank 3, 'd' is cut
    assert(got.toSeq == Seq(("a", 2L, 1), ("b", 2L, 2), ("c", 1L, 3)), got.mkString(";"))
  }

  test("interarrival: exact gap micros, integer mean, single-event users drop") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:00:10"), 2L),
      (1L, ts("2024-01-01 00:01:10"), 3L),
      (2L, ts("2024-01-01 05:00:00"), 4L) // single event → no gaps
    ).toDF("user_id", "ts", "event_id")
    val got = ops.Events.interarrivalCore(ev).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 10000000L && r.getLong(3) == 60000000L)
    assert(r.getLong(4) == 35000000L) // (10s + 60s) / 2 exactly
    assert(!r.getBoolean(5))
  }

  test("interarrival: equal-ts events tiebreak on event_id, zero gap is legal") {
    val ev = Seq(
      (7L, ts("2024-01-01 00:00:00"), 2L),
      (7L, ts("2024-01-01 00:00:00"), 1L),
      (7L, ts("2024-01-01 02:00:01"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val r = ops.Events.interarrivalCore(ev).collect().head
    assert(r.getLong(2) == 0L, "duplicate-ts gap must be 0: " + r)
    assert(r.getLong(4) == 3600500000L)
    assert(r.getBoolean(5), "0s min + >1h mean = bursty: " + r)
  }

  test("psi drift: empty-bin and surplus-bin cells carry all the signal") {
    // ref half (us 0..9): values 10..100 → fences 10..90, one value
    // per decile bin; cur half (us 91..100): values 15..105 — every
    // interior bin keeps one value, bin 1 empties, bin 10 doubles.
    // With Laplace +1 over n=10, denom=20: interior cells cancel to
    // 0, bin1 = (2/20 − 1/20)·ln 2, bin10 = (2/20 − 3/20)·ln(2/3).
    val rows = ((0 to 9).map(i => ("a", i.toLong, (i + 1) * 10.0)) ++
      (0 to 9).map(i => ("a", 91L + i, (i + 1) * 10.0 + 5.0)))
      .toDF("event_type", "us", "value")
    val r = ops.Relational.psiDriftCore(rows).collect()
    assert(r.length == 10, r.mkString(";"))
    def cell(bin: Int) = r.find(_.getInt(1) == bin).get
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    assert(cell(1).getLong(2) == 1L && cell(1).getLong(3) == 0L)
    assert(cell(1).getDouble(6) == rd(0.05 * math.log(2.0)), cell(1).toString)
    assert(cell(10).getLong(3) == 2L)
    assert(cell(10).getDouble(6) == rd(-0.05 * math.log(2.0 / 3.0)), cell(10).toString)
    (2 to 9).foreach(b => assert(cell(b).getDouble(6) == 0.0, cell(b).toString))
    assert(cell(1).getDouble(7) ==
      rd(0.05 * math.log(2.0) - 0.05 * math.log(2.0 / 3.0)), "psi_total")
  }

  test("psi drift: identical halves score exactly zero") {
    val rows = ((0 to 9).map(i => ("a", i.toLong, (i + 1) * 1.0)) ++
      (0 to 9).map(i => ("a", 91L + i, (i + 1) * 1.0)))
      .toDF("event_type", "us", "value")
    val r = ops.Relational.psiDriftCore(rows).collect()
    assert(r.forall(_.getDouble(7) == 0.0), r.mkString(";"))
  }

  test("ewma: dyadic half-life decay, 24-hour horizon, type isolation") {
    // type a hours 0,1,2 with counts 4,2,1:
    //   h0 = 4; h1 = (2 + 4·.5)/1.5 = 8/3; h2 = (1 + 2·.5 + 4·.25)/1.75 = 12/7
    // type b hours 0 and 25: Δ = 25 > 23 → h25 sees only itself
    val ev = (
      Seq.fill(4)(("a", ts("2024-01-01 00:10:00"))) ++
      Seq.fill(2)(("a", ts("2024-01-01 01:20:00"))) ++
      Seq(("a", ts("2024-01-01 02:30:00")),
          ("b", ts("2024-01-01 00:05:00")), ("b", ts("2024-01-02 01:05:00")))
    ).toDF("event_type", "ts")
    val got = ops.Relational.ewmaCore(ev).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) -> r.getDouble(3)).toMap
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(("a", "2024-01-01 00:00:00.0")) == 4.0, got.toString)
    assert(got(("a", "2024-01-01 01:00:00.0")) == rd(8.0 / 3.0), got.toString)
    assert(got(("a", "2024-01-01 02:00:00.0")) == rd(12.0 / 7.0), got.toString)
    assert(got(("b", "2024-01-01 00:00:00.0")) == 1.0, got.toString)
    assert(got(("b", "2024-01-02 01:00:00.0")) == 1.0, "past the 24h horizon")
  }

  test("profile: planted nulls and duplicates move exactly their cells") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 5.0, Option("{}")),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 5.0, None),
      (3L, ts("2024-01-01 12:00:00"), 2L, "click", 7.5, Option("{}")),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = ops.Relational.profileCore(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("props").getLong(2) == 1L, "one planted null props")
    assert(got("props").getLong(3) == 1L, "nulls don't count as distinct")
    assert(got("value").getLong(3) == 2L && got("value").getDouble(4) == 5.0
      && got("value").getDouble(5) == 7.5, got("value").toString)
    assert(got("event_type").getString(6) == "click"
      && got("event_type").getString(7) == "view", got("event_type").toString)
    assert(got("user_id").getLong(3) == 2L, got("user_id").toString)
  }

  test("convert latency: first purchase wins, 24h horizon, discrete ranks") {
    // Monday 2024-01-01: view at 10:00 → purchases at 10:30 and 11:00
    // (first = 1800 s); view at 12:00 → purchase next day 11:50
    // (within 24h, 85800 s); view at 23:00 → nothing within 24h
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"), (2L, "2024-01-01 10:30:00", 1L, "purchase"),
      (3L, "2024-01-01 11:00:00", 1L, "purchase"), (4L, "2024-01-01 12:00:00", 2L, "view"),
      (5L, "2024-01-02 11:50:00", 2L, "purchase"), (6L, "2024-01-01 23:00:00", 3L, "view"),
    ).map { case (id, t, u, ty) => (id, ts(t), u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = ops.Events.convertLatencyCore(ev).collect()
    assert(got.length == 1 && got.head.getInt(0) == 1, "both conversions on Monday")
    val r = got.head
    assert(r.getLong(1) == 2L, r.toString)
    assert(r.getDouble(2) == 1800.0 && r.getDouble(5) == 85800.0, r.toString)
    // n=2: med rank ceil(1.0)=1 → 1800; p90 rank ceil(1.8)=2 → 85800
    assert(r.getDouble(3) == 1800.0 && r.getDouble(4) == 85800.0, r.toString)
  }

  test("rfm: cohort-scoped quartiles, rounded-monetary ranking, segment string") {
    // one cohort (all first-seen in Jan), 4 purchasers with distinct
    // recency/frequency/monetary orders → each score hits 1..4 once;
    // user 5 has no purchases → absent despite having events
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "purchase", 40.0), (2L, "2024-01-02 10:00:00", "purchase", 30.0),
      (3L, "2024-01-03 10:00:00", "purchase", 20.0), (4L, "2024-01-04 10:00:00", "purchase", 10.0),
      (3L, "2024-01-05 10:00:00", "purchase", 1.0), (3L, "2024-01-06 10:00:00", "purchase", 1.0),
      (4L, "2024-01-07 10:00:00", "purchase", 1.0), (5L, "2024-01-08 10:00:00", "view", 0.0),
    ).zipWithIndex.map { case ((u, t, ty, v), i) => (i.toLong, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = ops.Events.rfmCore(ev).collect()
      .map(r => r.getLong(0) -> r.getString(8)).toMap
    // recency desc: 4 (Jan 7) > 3 (Jan 6) > 2 > 1; freq desc: 3 (3×),
    // 4 (2×), then 1,2 (tie → user_id); monetary desc: 40, 30, 22, 12
    assert(got(1L) == "431", got.toString)
    assert(got(2L) == "342", got.toString)
    assert(got(3L) == "213", got.toString)
    assert(got(4L) == "124", got.toString)
    assert(!got.contains(5L), "non-purchasers carry no RFM row")
  }

  test("incr agg: base-only, delta-only, and straddling hours all merge exactly") {
    // span us 0..100 → mid 50. Hour A: both events in base; hour B:
    // one base (us 40) + one delta (us 60); hour C: delta only.
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", "a"), (2L, "2024-01-01 00:20:00", "a"),
      (3L, "2024-01-01 05:00:00", "a"), (4L, "2024-01-01 05:59:00", "a"),
      (5L, "2024-01-01 09:59:59", "a"),
    ).map { case (id, t, ty) => (id, ts(t), ty) }.toDF("event_id", "ts", "event_type")
    // us midpoint = (00:10 + 09:59:59)/2 ≈ 05:05 → events 1,2,3 base;
    // 4 (05:59) and 5 delta — hour 05 straddles
    val got = ops.Events.incrAggCore(ev).collect()
      .map(r => r.getTimestamp(1).toString -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("2024-01-01 00:00:00.0") == ((2L, 2L, 0L)), got.toString)
    assert(got("2024-01-01 05:00:00.0") == ((2L, 1L, 1L)), got.toString)
    assert(got("2024-01-01 09:00:00.0") == ((1L, 0L, 1L)), got.toString)
  }

  test("quantile norm: ceiling-rank mapping, reference maps to itself") {
    // ref 'view' values 10,20,30,40 (n_ref=4); type b values 1,2
    // (n=2): rank 1 → target (1·4+1)÷2 = 2 → 20; rank 2 → 4 → 40
    val ev = Seq(
      ("view", 1L, 10.0), ("view", 2L, 20.0), ("view", 3L, 30.0), ("view", 4L, 40.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0),
    ).toDF("event_type", "event_id", "value")
    val got = ops.Relational.quantileNormCore(ev).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(5L) == 20.0 && got(6L) == 40.0, got.toString)
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(got(id) == id * 10.0, s"reference row $id must map to itself"))
  }

  test("drawdown: peak tracking and the latest-trough tiebreak") {
    // user 1: 5, 3, 8, 2 → peaks 5,5,8,8 → dds 0,2,0,6 → max 6 at id 4
    // user 2: monotone rise → max drawdown 0, trough = last row
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 5.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, 3.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, 8.0),
      (4L, ts("2024-01-01 13:00:00"), 1L, 2.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, 1.0),
      (6L, ts("2024-01-01 11:00:00"), 2L, 2.0),
    ).toDF("event_id", "ts", "user_id", "value")
    val got = ops.Events.drawdownCore(ev).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == ((6.0, 4L, 8.0)), got.toString)
    assert(got(2L) == ((0.0, 6L, 2.0)), got.toString)
  }

  test("rolling median: lower-median index, frame warm-up, spike immunity") {
    // user 1 values 1,100,2,3,4: frames [1],[1,100],[1,2,100],
    // [1,2,3,100],[1,2,3,4,100] → medians 1,1,2,2,3 — the 100 spike
    // never surfaces (it would drag every mean)
    val ev = Seq(1.0, 100.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      (1L, ts(s"2024-01-01 10:0$i:00"), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = ops.Windows.windowRollingMedianCore(ev).collect().map(_.getDouble(4))
    assert(got.toSeq == Seq(1.0, 1.0, 2.0, 2.0, 3.0), got.mkString(","))
  }

  test("seq match: strict (0, 1h] window, unmatched views keep their denominator") {
    // user 1: click at +30min matches; click at exactly +1h matches;
    // click at the same instant does NOT (strict >); user 2 never
    // clicks → rate 0; user 3 only clicks → no row
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "view"),
      (4L, ts("2024-01-01 13:00:00"), 1L, "click"),
      (5L, ts("2024-01-01 14:00:00"), 1L, "view"),
      (6L, ts("2024-01-01 14:00:00"), 1L, "click"),
      (7L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (8L, ts("2024-01-01 10:10:00"), 3L, "click"),
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = ops.Events.seqMatchCore(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((3L, 2L, rd(2.0 / 3.0))), got.toString)
    assert(got(2L) == ((1L, 0L, 0.0)), got.toString)
    assert(!got.contains(3L), "click-only users have no views to report")
  }

  test("closed-form OLS recovers a hand-built line exactly") {
    // group "lin": y = 2x + 1 exactly → slope 2, intercept 1, r² = 1
    // group "flat": y constant → slope 0, intercept = the constant
    val ev = Seq(
      ("lin", 0.0, 1.0), ("lin", 1.0, 3.0), ("lin", 2.0, 5.0), ("lin", 3.0, 7.0),
      ("flat", 0.0, 4.0), ("flat", 1.0, 4.0), ("flat", 2.0, 4.0),
    ).toDF("event_type", "x", "y")
    val rows = ops.Relational.regressionCore(ev).collect()
    val got = rows.map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("lin") == ((2.0, 1.0)), got("lin").toString)
    assert(got("flat") == ((0.0, 4.0)), got("flat").toString)
    val lin = rows.find(_.getString(0) == "lin").get
    assert(lin.getDouble(4) == 1.0, s"perfect line must have r2 = 1, got $lin")
    // constant y: zero variance → r² is NULL (the regr_* convention)
    assert(rows.find(_.getString(0) == "flat").get.isNullAt(4))
  }

  test("PMI: associated pair scores ln 2, independent pairs 0, disjoint absent") {
    // N=4: c,d always together (positive association); b never with
    // c/d; everything co-occurs with the ubiquitous a at independence
    val docs = Seq(
      (1L, "a c d"), (2L, "a c d"), (3L, "a b"), (4L, "a b"),
    ).toDF("doc_id", "text")
    val got = ops.Text.pmiCore(docs, minSupport = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // (c,d): c_ab=2, c_c=c_d=2 → pmi = ln(2·4/(2·2)) = ln 2
    assert(got(("c", "d")) == ((2L, BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // ubiquitous a is independent of everything: ln(2·4/(4·2)) = 0
    assert(got(("a", "b"))._2 == 0.0 && got(("a", "c"))._2 == 0.0)
    // b never meets c or d → no row at all
    assert(!got.contains(("b", "c")) && !got.contains(("b", "d")))
  }

  test("attribution: equal split within 24h, stale clicks and other users excluded") {
    // user 7: purchase 30.0 splits across both prior clicks (15 each);
    // purchase 10.0 precedes click 2 → only click 1 touches it.
    // user 9: purchase lands 25h after the click → no attribution.
    val ev = Seq(
      (1L, "click", "2024-01-01 09:00:00", 7L, 0.0),
      (2L, "click", "2024-01-01 10:00:00", 7L, 0.0),
      (3L, "purchase", "2024-01-01 09:30:00", 7L, 10.0),
      (4L, "purchase", "2024-01-01 10:30:00", 7L, 30.0),
      (5L, "click", "2024-01-01 01:00:00", 9L, 0.0),
      (6L, "purchase", "2024-01-02 02:00:00", 9L, 50.0),
    ).map { case (id, et, t, u, v) => (id, et, ts(t), u, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.attributionCore(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(1L -> ((2L, 25.0)), 2L -> ((1L, 15.0))), got.toString)
  }

  test("scd2: consecutive same-state events collapse, current interval stays open") {
    // user 1: a a b a → [09:00,11:00) a ×2, [11:00,12:00) b, [12:00,∅) a
    val ev = Seq(
      (1L, "a", "2024-01-01 09:00:00", 1L, 0.0),
      (2L, "a", "2024-01-01 10:00:00", 1L, 0.0),
      (3L, "b", "2024-01-01 11:00:00", 1L, 0.0),
      (4L, "a", "2024-01-01 12:00:00", 1L, 0.0),
    ).map { case (id, et, t, u, v) => (id, et, ts(t), u, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.scd2Core(ev).collect()
      .map(r => (r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", ts("2024-01-01 09:00:00"), Some(ts("2024-01-01 11:00:00")), 2L),
      ("b", ts("2024-01-01 11:00:00"), Some(ts("2024-01-01 12:00:00")), 1L),
      ("a", ts("2024-01-01 12:00:00"), None, 1L)), got.mkString(", "))
  }

  test("transitions: bigram counts row-normalize per from-state") {
    // user 1: a→b, b→a, a→b ; user 2: a→b. From a: b 3/3; from b: a 1/1.
    val ev = Seq(
      (1L, "a", "2024-01-01 09:00:00", 1L), (2L, "b", "2024-01-01 09:10:00", 1L),
      (3L, "a", "2024-01-01 09:20:00", 1L), (4L, "b", "2024-01-01 09:30:00", 1L),
      (5L, "a", "2024-01-01 09:00:00", 2L), (6L, "b", "2024-01-01 09:10:00", 2L),
    ).map { case (id, et, t, u) => (id, et, ts(t), u, 0.0) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.transitionsCore(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(("a", "b") -> ((3L, 1.0)), ("b", "a") -> ((1L, 1.0))),
      got.toString)
  }

  test("twap: value held until the next event, last event weightless") {
    // user 1: 10 held 1h, 20 held 2h, 30 held 0 → (10·1+20·2)/3 = 16.6667
    val ev = Seq(
      (1L, "2024-01-01 09:00:00", 10.0), (2L, "2024-01-01 10:00:00", 20.0),
      (3L, "2024-01-01 12:00:00", 30.0),
    ).map { case (id, t, v) => (id, "x", ts(t), 1L, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Events.twapCore(ev).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L * 3600L * 1000000L &&
      r.getDouble(3) == 16.6667, r.toString)
  }

  test("streaks: a one-day gap splits the island") {
    // user 1 active Jan 1,2,3 then 5,6 → streaks 3 and 2; duplicate
    // events within a day collapse before islanding
    val ev = Seq(
      "2024-01-01 09:00:00", "2024-01-01 17:00:00", "2024-01-02 09:00:00",
      "2024-01-03 09:00:00", "2024-01-05 09:00:00", "2024-01-06 09:00:00",
    ).zipWithIndex.map { case (t, i) => (i.toLong, "x", ts(t), 1L, 0.0) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Events.streaksCore(ev).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((5L, 2L, 3L)), r.toString)
  }

  test("concurrency: sessions cover exactly the hour ticks inside [start, end)") {
    // user 1: events 09:10, 09:50 → session [09:10, 10:20) covers tick 10:00
    // user 2: event 09:00 → session [09:00, 09:30) covers tick 09:00 (start
    // on the boundary is itself a tick; end 09:30 reaches no further tick)
    val ev = Seq(
      (1L, ts("2024-01-01 09:10:00"), 1L), (2L, ts("2024-01-01 09:50:00"), 1L),
      (3L, ts("2024-01-01 09:00:00"), 2L),
    ).map { case (id, t, u) => (id, "x", t, u, 0.0) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.concurrencyCore(ev).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == Map(ts("2024-01-01 09:00:00") -> 1L,
      ts("2024-01-01 10:00:00") -> 1L), got.toString)
  }

  test("mad outliers: discrete medians, threshold flags only the planted spike") {
    // values 1..6 and 100: median = 4th of 7 sorted = 4; |dev| sorted
    // [0,1,1,2,2,3,96] → MAD = 2; threshold 3·1.4826·2 = 8.8956 → only
    // the 96 deviation flags
    val ev = (1 to 6).map(_.toDouble) :+ 100.0
    val df = ev.zipWithIndex.map { case (v, i) =>
      (i.toLong, "x", ts("2024-01-01 09:00:00"), 1L, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Relational.madOutliersCore(df).collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)) ==
      ((7L, 4.0, 2.0, 1L)), r.toString)
  }

  test("merge upsert: delta wins, base carries, new keys insert") {
    // span 00:00→24:00, midpoint 12:00. user 1 in both halves →
    // upsert with delta's latest; user 2 base-only → carry; user 3
    // delta-only → insert.
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 2L, "a", 1.0),
      (2L, "2024-01-01 01:00:00", 1L, "b", 2.0),
      (3L, "2024-01-01 23:00:00", 1L, "c", 3.0),
      (4L, "2024-01-02 00:00:00", 3L, "d", 4.0),
    ).map { case (id, t, u, et, v) => (id, et, ts(t), u, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.mergeUpsertCore(ev).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(4))).toMap
    assert(got == Map(1L -> (("c", "upsert")), 2L -> (("a", "carry")),
      3L -> (("d", "insert"))), got.toString)
  }

  test("path mining: sessions split on the gap, paths order and truncate") {
    // user 1: events at 09:00..09:04 + one at 09:05 (6 events → path
    // truncates to first 5), then a 31-min gap starts a new session
    // "b". user 2: "a>b".
    val u1 = (0 to 5).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      ts(f"2024-01-01 09:0$i%d:00"), 1L, 0.0))
    val ev = (u1 ++ Seq(
      (10L, "b", ts("2024-01-01 09:37:00"), 1L, 0.0),
      (20L, "a", ts("2024-01-01 09:00:00"), 2L, 0.0),
      (21L, "b", ts("2024-01-01 09:10:00"), 2L, 0.0),
    )).toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Events.pathMiningCore(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(
      "a>b>a>b>a" -> ((1L, 6.0)), // truncated to 5, avg_len counts all 6
      "b" -> ((1L, 1.0)),
      "a>b" -> ((1L, 2.0))), got.toString)
  }

  test("cusum peaks at the planted level shift") {
    // 6 hours of counts [1,1,1,5,5,5]: mean 3, cusum [-2,-4,-6,-4,-2,0]
    // → |peak| at hour 3 (11:00) with cusum -6
    val ev = (0 until 6).flatMap { h =>
      (0 until (if (h < 3) 1 else 5)).map(i =>
        ((h * 10 + i).toLong, "x", ts(f"2024-01-01 ${9 + h}%02d:00:00"), 1L, 0.0))
    }.toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Relational.cusumCore(ev).collect().head
    assert(r.getLong(1) == 6L && r.getTimestamp(2) == ts("2024-01-01 11:00:00") &&
      r.getDouble(3) == -6.0, r.toString)
  }

  test("gini: uniform values score 0, total concentration approaches 1") {
    // "eq": all equal → G = 0. "conc": one holder of everything over
    // n=4 → G = 2·(4·10)/(4·10) − 5/4 = 0.75 (= (n−1)/n)
    val ev = (
      (1 to 4).map(i => (i.toLong, "eq", ts("2024-01-01 09:00:00"), 1L, 2.5)) ++
      (1 to 4).map(i => (10L + i, "conc", ts("2024-01-01 09:00:00"), 1L,
        if (i == 4) 10.0 else 0.0))
    ).toDF("event_id", "event_type", "ts", "user_id", "value")
    val got = ops.Relational.giniCore(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("eq") == 0.0 && got("conc") == 0.75, got.toString)
  }

  test("autocorr: alternating hourly counts give r1<0, r2>0 with exact ratios") {
    // 8 hours alternating counts [3,1,3,1,...]: d alternates ±1, so
    // c0 = 1, c1 = −1 (7 pairs), c2 = +1 (6), c3 = −1 (5) →
    // r1 = −7/8, r2 = 6/8, r3 = −5/8
    val ev = (0 until 8).flatMap { h =>
      (0 until (if (h % 2 == 0) 3 else 1)).map(i =>
        ((h * 10 + i).toLong, "alt", ts(f"2024-01-01 ${8 + h}%02d:00:00"), 1L, 0.0))
    }.toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Relational.autocorrCore(ev).collect().head
    assert(r.getLong(1) == 8L, r.toString)
    assert(r.getDouble(2) == -0.875 && r.getDouble(3) == 0.75 &&
      r.getDouble(4) == -0.625, r.toString)
  }

  test("chisq: product distribution scores 0; a zero cell still contributes E") {
    // independent 2×2 with cell counts (1,2,2,4): every E equals O → χ²=0
    val ind = (Seq.fill(1)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq.fill(2)(("y", "u")) ++ Seq.fill(4)(("y", "v"))).toDF("a", "b")
    val indRows = ops.Relational.chisqCore(ind).collect()
    assert(indRows.length == 4 && indRows.forall(_.getDouble(5) == 0.0),
      indRows.mkString(";"))
    assert(indRows.forall(_.getLong(6) == 1L))
    // (y,u) never observed: the densified grid must emit it with n=0
    // and contribution (0−E)²/E = E = 3·2/6 = 1
    val zero = (Seq.fill(2)(("x", "u")) ++ Seq.fill(1)(("x", "v")) ++
      Seq.fill(3)(("y", "v"))).toDF("a", "b")
    val zRows = ops.Relational.chisqCore(zero).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(zRows(("y", "u")) == ((0L, 1.0)), zRows.toString)
  }

  test("winsorize: discrete fences clamp exactly one value each side") {
    // values 10,20,…,190,1000 (n=20): IEEE 20·0.05 rounds to exactly
    // 1.0 → lo fence is the rank-1 MIN (nothing clips low — the ANSI
    // ceil-rank convention, identical in DuckDB); 20·0.95 rounds up to
    // 19.0 → hi fence is the rank-19 value 190, clipping only the
    // 1000 outlier; winsorized mean = (2900 − 810)/20 = 104.5
    val rows = ((1 to 19).map(i => ("g", i * 10.0)) :+ (("g", 1000.0)))
      .toDF("grp", "v")
    val r = ops.Relational.winsorizeCore(rows).collect().head
    assert(r.getLong(1) == 20L, r.toString)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 190.0, r.toString)
    assert(r.getLong(4) == 0L && r.getLong(5) == 1L, r.toString)
    assert(r.getDouble(6) == 145.0 && r.getDouble(7) == 104.5, r.toString)
  }

  test("dq audit: every planted violation flips exactly its own rule") {
    // dup orderkey 1; lineitem orphan 99; order 11 points at missing
    // customer 5; one negative value; one n_chars lie; one null segment
    val orders = Seq((1L, 1L), (1L, 2L), (11L, 5L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(1L, 99L).toDF("l_orderkey")
    val customer = Seq((1L, Option("A")), (2L, None: Option[String]))
      .toDF("c_custkey", "c_mktsegment")
    val events = Seq(1.0, -2.0).toDF("value")
    val documents = Seq(("ab", 2L), ("ab", 3L)).toDF("text", "n_chars")
    val got = ops.Relational.dqAuditCore(orders, lineitem, customer, events, documents)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got == Map(
      "orders_pk_unique" -> ((3L, 1L, false)),
      "lineitem_fk_orders" -> ((2L, 1L, false)),
      "orders_fk_customer" -> ((3L, 1L, false)),
      "events_value_nonneg" -> ((2L, 1L, false)),
      "documents_nchars_consistent" -> ((2L, 1L, false)),
      "customer_segment_notnull" -> ((2L, 1L, false))), got.toString)
  }

  test("entropy: uniform mix scores ln k with norm 1, monolingual scores 0 with NULL norm") {
    val docs = Seq(
      (1L, "A", "en"), (2L, "A", "fr"), (3L, "A", "en"), (4L, "A", "fr"),
      (5L, "B", "en"), (6L, "B", "en"),
    ).toDF("doc_id", "source", "lang")
    val got = ops.Text.entropyCore(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("A") == ((4L, 2L, r6(math.log(2)), Some(1.0))), got.toString)
    assert(got("B") == ((2L, 1L, 0.0, None)), got.toString)
  }

  test("welch t on hand samples matches the closed form") {
    // x: 1,2,3 (n 3, mean 2, var 1); y: 4,6 (n 2, mean 5, var 2)
    // t = −3/√(1/3 + 1) = −2.5981; df = (4/3)²/((1/9)/2 + 1) = 1.68
    val ev = (Seq(1.0, 2.0, 3.0).map(v => ("x", v)) ++ Seq(4.0, 6.0).map(v => ("y", v)))
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, ts("2024-01-01 09:00:00"), 1L, v) }
      .toDF("event_id", "event_type", "ts", "user_id", "value")
    val r = ops.Relational.welchCore(ev).collect().head
    assert((r.getLong(2), r.getLong(3)) == ((3L, 2L)), r.toString)
    assert(r.getDouble(4) == -2.5981 && r.getDouble(5) == 1.68, r.toString)
  }

  test("funnel steps are strictly ordered within (user, day)") {
    // user 1: view 09:00 → click 09:30 → purchase 10:00  = full funnel
    // user 2: click 08:00 BEFORE first view 09:00; click 09:10 after →
    //         counts; purchase 09:05 is before that click → does NOT
    // user 3: view only
    // user 4: purchase with no view → contributes nothing
    val events = Seq(
      (1L, "view", "2024-01-03 09:00:00"), (1L, "click", "2024-01-03 09:30:00"),
      (1L, "purchase", "2024-01-03 10:00:00"),
      (2L, "click", "2024-01-03 08:00:00"), (2L, "view", "2024-01-03 09:00:00"),
      (2L, "purchase", "2024-01-03 09:05:00"), (2L, "click", "2024-01-03 09:10:00"),
      (3L, "view", "2024-01-03 11:00:00"),
      (4L, "purchase", "2024-01-03 12:00:00"),
    ).map { case (u, k, t) => (u, k, ts(t), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    // drive the same steps the query runs, on the fixture
    val e = events.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type"), col("ts"))
    val viewed = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("t_view"))
    val clicked = e.filter(col("event_type") === "click")
      .join(viewed, Seq("user_id", "day")).filter(col("ts") > col("t_view"))
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("t_click"))
    val purchased = e.filter(col("event_type") === "purchase")
      .join(clicked, Seq("user_id", "day")).filter(col("ts") > col("t_click"))
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("t_purchase"))
    assert(viewed.select("user_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(clicked.select("user_id").as[Long].collect().toSet == Set(1L, 2L))
    // user 2's only purchase precedes the qualifying click
    assert(purchased.select("user_id").as[Long].collect().toSet == Set(1L))
  }

  test("retention offsets count weeks since each user's first active week") {
    // user 1 first seen week of Mon 2024-01-01: active wk0, wk2
    // user 2 first seen week of Mon 2024-01-08: active wk0, wk1
    val events = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-17 10:00:00"),
      (2L, "2024-01-09 10:00:00"), (2L, "2024-01-15 10:00:00"),
      (2L, "2024-01-16 10:00:00"), // same week as the 15th — one active week
    ).map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val e = events.select(col("user_id"), trunc(to_date(col("ts")), "week").as("w"))
    val activity = e.distinct()
    val cohort = activity.groupBy(col("user_id")).agg(min(col("w")).as("cohort_week"))
    val triangle = activity.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(triangle == Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("compaction keeps the latest event per user, ties broken by event_id") {
    val got = ops.Events.compactLatest(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap
    // independent rendering: window max over collected rows
    val all = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val expect = all.groupBy(_._1).map { case (u, rows) =>
      val best = rows.maxBy(r => (r._2.getTime, r._3))
      u -> (best._2, best._3)
    }
    assert(got == expect)
  }

  test("densify fills every hour-type cell: zeros present, totals conserved") {
    val got = ops.Events.densify(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val types = got.map(_._2).distinct.length
    val hours = got.map(_._1).distinct.length
    assert(got.length == types * hours, "output must be the full dense grid")
    assert(got.exists(_._3 == 0L), "the fixed span must contain at least one empty cell")
    val total = got.map(_._3).sum
    val plain = Tables.events(spark, sf0001).count()
    assert(total == plain, s"gap filling must not invent or drop events: $total vs $plain")
    // spine is contiguous: hour steps of exactly 1h between distinct hours
    val hs = got.map(_._1.getTime).distinct.sorted
    assert(hs.sliding(2).forall { case Array(a, b) => b - a == 3600000L; case _ => true })
  }

  test("degree histogram counts parallel edges") {
    // node 10 → two parallel edges to 20 plus one to 30: degree 3;
    // 20 and 30 each have the reverse degree from symmetry
    val edges = Seq((10L, 20L), (10L, 20L), (10L, 30L)).toDF("src", "dst")
    val sym = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val hist = sym.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10: deg 3; 20: deg 2 (two parallels back); 30: deg 1
    assert(hist == Set((3L, 1L), (2L, 1L), (1L, 1L)))
  }

  test("skew profile: planted hot key tops the list with the hand-derived ratio") {
    // key 1 × 6, key 2 × 2, keys 3..6 × 1 → 12 rows, 6 keys,
    // mean 2, skew_ratio = 6/2 = 3, shares 0.5 / 2⁄12 / 1⁄12
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L, 5L, 6L)).toDF("k")
    val got = ops.Relational.skewProfileCore(rows).collect()
    assert(got.length == 6)
    val top = got.head
    assert(top.getInt(0) == 1 && top.getLong(1) == 1L && top.getLong(2) == 6L)
    assert(top.getDouble(3) == 0.5 && top.getDouble(4) == 0.5)
    assert(top.getDouble(6) == 3.0, s"skew ratio ${top.getDouble(6)}")
    val second = got(1)
    assert(second.getLong(1) == 2L && second.getDouble(3) == 0.166667
      && second.getDouble(4) == 0.666667)
    // cumulative share reaches 1 on the last ranked key
    assert(got.last.getDouble(4) == 1.0)
  }

  test("yoy growth: same-month lag alignment, first year NULL, exact-cent arithmetic") {
    // Jan-1995 100.00, Jan-1996 150.00 (+50%), Feb-1996 80.00 (no prior Feb)
    val orders = Seq(
      (ts("1995-01-15 00:00:00"), 100.0),
      (ts("1996-01-20 00:00:00"), 150.0),
      (ts("1996-02-05 00:00:00"), 80.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = ops.Relational.yoyGrowthCore(orders).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got((1995, 1)) == ((10000L, None)), got.toString)
    assert(got((1996, 1)) == ((15000L, Some(50.0))), got.toString)
    assert(got((1996, 2)) == ((8000L, None)), "no prior February: " + got)
  }

  test("rolling z-score: hand-computed frame stats, flat history drops, short history unscored") {
    // user 1: values 1..5 then a spike of 10 — the spike's frame is
    // exactly {1..5}: Σu = 15e4, Σu² = 55e8, n = 5,
    // z = (5·10e4 − 15e4)/√(5·55e8 − 2.25e10) = 35e4/√(5e9) ≈ 4.9497
    // user 2: five identical values then anything — variance 0 → no row
    val rows = ((1 to 5).map(i => (1L, i.toLong, ts(f"2024-01-01 00:00:0$i"), i.toDouble)) ++
      Seq((1L, 6L, ts("2024-01-01 00:00:06"), 10.0)) ++
      (1 to 6).map(i => (2L, 10L + i, ts(f"2024-01-01 00:00:0$i"), 7.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val got = ops.Events.rollingZscoreCore(rows).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 6L)
    assert(r.getDouble(3) == math.rint(350000.0 / math.sqrt(5.0e9) * 1e4) / 1e4)
    assert(r.getBoolean(4), "4.95 sigma must flag")
  }

  test("cumulative distinct: a returning user is new only on their first day") {
    val rows = Seq(
      (ts("2024-01-01 01:00:00"), 1L), (ts("2024-01-02 01:00:00"), 1L),
      (ts("2024-01-02 02:00:00"), 2L))
      .toDF("ts", "user_id")
    val got = ops.Events.cumulativeDistinctCore(rows).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, 1L, 1L),
      ("2024-01-02", 2L, 1L, 2L)), got.mkString(";"))
  }

  test("rolling 7-day actives: membership holds at day d-6 and expires at d-7") {
    // u1 active day 1; u2 day 7; u3 day 8. Day 7 still counts u1
    // (7−1 = 6 ≤ 6); day 8 no longer does (8−1 = 7).
    val rows = Seq(
      (ts("2024-01-01 01:00:00"), 1L),
      (ts("2024-01-07 01:00:00"), 2L),
      (ts("2024-01-08 01:00:00"), 3L))
      .toDF("ts", "user_id")
    val got = ops.Events.rollingActiveCore(rows).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L), ("2024-01-07", 2L), ("2024-01-08", 2L)), got.mkString(";"))
  }

  test("churn labels: midpoint split, event AT the split retains, silence floors to days") {
    // range 01-01 00:00 .. 01-03 00:00 → mid = 01-02 00:00 exactly.
    // u1: one feature event, nothing after → churned, 24h silent = 1 day
    // u2: feature at 06:00 (18h silent → 0 days), label event → retained
    // u3: label event exactly AT the midpoint → label-half, retained
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.25),
      (2L, ts("2024-01-01 06:00:00"), 2L, "view", 2.00),
      (3L, ts("2024-01-03 00:00:00"), 2L, "view", 0.0),
      (4L, ts("2024-01-01 00:00:00"), 3L, "view", 0.99),
      (5L, ts("2024-01-02 00:00:00"), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = ops.Events.churnLabelsCore(rows).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, 125L, 1L, true)),
      2L -> ((1L, 1L, 200L, 0L, false)),
      3L -> ((1L, 1L, 99L, 1L, false))), got.toString)
  }

  test("attribution decay: dyadic half-life weights, 6h and 24h boundaries pinned") {
    // purchase (id 10, value 40) at 2024-01-02 00:00; clicks at Δ=24h
    // (k=4, wu=1), Δ=6h (k=1, wu=8), Δ=1h (k=0, wu=16): Σwu = 25 →
    // credits 40·{1,8,16}/25 = 1.6, 12.8, 25.6
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 18:00:00"), 7L, "click", 0.0),
      (3L, ts("2024-01-01 23:00:00"), 7L, "click", 0.0),
      (10L, ts("2024-01-02 00:00:00"), 7L, "purchase", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = ops.Events.attributionDecayCore(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(1L -> ((1L, 1.6)), 2L -> ((1L, 12.8)), 3L -> ((1L, 25.6))),
      got.toString)
  }

  test("seasonal anomaly: hand-built cell flags only the outlier; flat and thin cells unscored") {
    // cell (buy, 05h): 30 × 10.0 plus one 20.0 — u: 1000×30, 2000×1,
    // n = 31, Σu = 32000, Σu² = 34e6; mean = 32000/31,
    // var = 34e6/31 − mean² ≈ 31217.5, σ ≈ 176.7 → z(20.0) ≈ 5.48
    // cell (buy, 06h): 30 identical values → variance 0, unscored
    // cell (buy, 07h): 29 rows (< 30) with a wild outlier, unscored
    val rows = ((1 to 30).map(i => (i.toLong, "buy", ts(f"2024-01-01 05:00:${i % 60}%02d"), 10.0)) ++
      Seq((31L, "buy", ts("2024-01-01 05:30:00"), 20.0)) ++
      (1 to 30).map(i => (40L + i, "buy", ts(f"2024-01-01 06:00:${i % 60}%02d"), 7.0)) ++
      (1 to 28).map(i => (80L + i, "buy", ts(f"2024-01-01 07:00:${i % 60}%02d"), 10.0)) ++
      Seq((110L, "buy", ts("2024-01-01 07:30:00"), 500.0)))
      .toDF("event_id", "event_type", "ts", "value")
    val got = ops.Events.seasonalAnomalyCore(rows).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getLong(0) == 31L && r.getInt(2) == 5, r.toString)
    val mean = 32000.0 / 31
    val variance = 34e6 / 31 - mean * mean
    assert(r.getDouble(4) ==
      math.rint((2000 - mean) / math.sqrt(variance) * 1e4) / 1e4, r.toString)
  }
}
