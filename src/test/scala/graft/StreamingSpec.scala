package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, max, timestamp_micros, unix_micros}

/** Drives the event-time transforms through an actual Structured
  * Streaming query (MemoryStream source → memory sink) — the same
  * functions the batch oracle checks (`ops.Events`), here under a
  * watermark with incremental batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumbling window closes and emits once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF.toDF("ts", "event_type", "value")
    val agg = Streaming.tumblingCounts(events.withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumb").start()
    try {
      mem.addData(
        (t("2024-01-01 00:05:00"), "click", 1.5),
        (t("2024-01-01 00:20:00"), "click", 2.5))
      q.processAllAvailable()
      // nothing can be final yet: watermark is still inside hour 0
      assert(spark.table("tumb").count() == 0)
      // an event far in the future advances the watermark past hour 0
      mem.addData((t("2024-01-01 02:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumb").collect()
      assert(rows.length == 1, rows.mkString(";"))
      val r = rows.head
      assert(r.getAs[String]("event_type") == "click")
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getAs[Double]("sum_value") == 4.0)
      assert(r.getAs[java.sql.Timestamp]("ws") == t("2024-01-01 00:00:00"))
    } finally q.stop()
  }

  test("stream-static enrichment join: micro-batches probe the static dim, no join state") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "HOME")).toDF("user_id", "segment")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "value")
    val agg = Streaming.enrichedTumbling(events.withWatermark("ts", "10 minutes"), dim)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("enrich").start()
    val streamed = try {
      mem.addData(
        (t("2024-01-01 00:05:00"), 1L, 1.0),
        (t("2024-01-01 00:20:00"), 2L, 2.0),
        (t("2024-01-01 00:40:00"), 1L, 3.0),
        (t("2024-01-01 00:50:00"), 9L, 9.0)) // no dim row: inner join drops
      q.processAllAvailable()
      mem.addData((t("2024-01-01 02:00:00"), 1L, 0.5)) // closes hour 0
      q.processAllAvailable()
      spark.table("enrich").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("segment"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    } finally q.stop()
    val batch = Streaming.enrichedTumbling(
      Seq((t("2024-01-01 00:05:00"), 1L, 1.0), (t("2024-01-01 00:20:00"), 2L, 2.0),
        (t("2024-01-01 00:40:00"), 1L, 3.0), (t("2024-01-01 00:50:00"), 9L, 9.0))
        .toDF("ts", "user_id", "value"), dim)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("segment"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    assert(streamed == batch.filter(_._1 == t("2024-01-01 00:00:00")),
      s"stream $streamed vs closed-window batch slice of $batch")
  }

  test("late rows beyond the watermark are dropped") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF.toDF("ts", "event_type", "value")
    val agg = Streaming.tumblingCounts(events.withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late").start()
    try {
      mem.addData((t("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 03:00:00"), "view", 1.0)) // watermark → 02:50
      q.processAllAvailable()
      mem.addData((t("2024-01-01 00:30:00"), "click", 9.0)) // late: hour-0 closed
      q.processAllAvailable()
      val hour0 = spark.table("late").collect()
        .filter(_.getAs[java.sql.Timestamp]("ws") == t("2024-01-01 00:00:00"))
      assert(hour0.length == 1 && hour0.head.getAs[Long]("n") == 1L,
        hour0.mkString(";"))
    } finally q.stop()
  }

  test("tumblingClosed (ST4 batch rendering) matches streaming append output") {
    implicit val ctx = spark.sqlContext
    val data = Seq(
      (t("2024-01-01 00:05:00"), "click", 1.0),
      (t("2024-01-01 00:20:00"), "view", 2.0),
      (t("2024-01-01 01:10:00"), "click", 3.0),
      (t("2024-01-01 03:00:00"), "view", 4.0)) // terminal watermark → 02:50
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = Streaming.tumblingCounts(
      mem.toDF.toDF("ts", "event_type", "value").withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("closed").start()
    val streamed = try {
      mem.addData(data: _*)
      q.processAllAvailable()
      spark.table("closed").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"))).toSet
    } finally q.stop()
    val batch = Streaming.tumblingClosed(data.toDF("ts", "event_type", "value"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"))).toSet
    // hours 0 and 1 are closed at the terminal watermark; hour 3 is open
    assert(batch.map(_._1).toSeq.distinct.sortBy(_.getTime) ==
      Seq(t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00")))
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("statefulSessions: gap-break emits immediately, timeout flushes the rest") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "value")
      .as[(java.sql.Timestamp, Long, Double)]
      .map { case (ts, u, v) => Streaming.Ev(u, ts, v, (v * 10).toLong) }
      .withWatermark("ts", "10 minutes") // after map: map drops the watermark tag
    val q = Streaming.statefulSessions(events, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("fmgs").start()
    try {
      mem.addData(
        (t("2024-01-01 00:00:00"), 1L, 1.0),
        (t("2024-01-01 00:10:00"), 1L, 2.0))
      q.processAllAvailable()
      // second session's first event breaks the gap → session 1 emits
      mem.addData((t("2024-01-01 01:30:00"), 1L, 3.0))
      q.processAllAvailable()
      val afterBreak = spark.table("fmgs").as[Streaming.SessionOut].collect()
      assert(afterBreak.map(s => (s.user_id, s.n_events, s.sum_value)).toSeq ==
        Seq((1L, 2L, 3.0)), afterBreak.mkString(";"))
      assert(afterBreak.head.session_end == t("2024-01-01 00:40:00"))
      // watermark far past session 2's gap → timeout flushes it
      mem.addData((t("2024-01-01 06:00:00"), 2L, 0.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 12:00:00"), 3L, 0.0))
      q.processAllAvailable()
      val all = spark.table("fmgs").as[Streaming.SessionOut].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(all.length == 2, all.mkString(";"))
      assert(all(1).n_events == 1L && all(1).session_start == t("2024-01-01 01:30:00"))
    } finally q.stop()
  }

  test("file-source streaming over the real events parquet matches batch") {
    // readStream needs an explicit schema; rawEventsSchema resolves the
    // file's own footer (whatever ts vintage is on disk) and the stream
    // normalizes exactly as Tables.events does
    val schema = Tables.rawEventsSchema(spark, sf0001)
    // the file stream source wants a directory to watch
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = Streaming.tumblingCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("filesrc").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filesrc").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n")).toMap
      val batch = Streaming.tumblingCounts(Tables.events(spark, sf0001)).collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n")).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  // ---- file-source executions over the real events parquet (r4
  // verdict task 4: sliding/session/stateful/band-join had green
  // batch faces and MemoryStream runs, but only tumbling had been
  // executed as a stream over the harness's actual files) ----

  /** A temp dir holding events.parquet as the single initial file of a
    * file-source stream, plus the raw-schema / normalized-stream pair
    * every file-source test needs. */
  private def eventsStreamDir(): (java.nio.file.Path, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("batch1.parquet"))
    val stream = Tables.normalizeTs(
      spark.readStream.schema(Tables.rawEventsSchema(spark, sf0001))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
    (dir, stream)
  }

  test("ST2 file-source: sliding windows over the real events parquet match batch") {
    val (_, stream) = eventsStreamDir()
    val q = Streaming.slidingCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("fs_slide").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fs_slide").collect()
        .map(r => r.getAs[java.sql.Timestamp]("ws") -> r.getAs[Long]("n")).toMap
      val batch = Streaming.slidingCounts(Tables.events(spark, sf0001)).collect()
        .map(r => r.getAs[java.sql.Timestamp]("ws") -> r.getAs[Long]("n")).toMap
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("ST3 file-source: session windows over the real events parquet match batch") {
    val (_, stream) = eventsStreamDir()
    // complete mode re-emits the whole merged-session state each batch,
    // so no watermark/nudge dance is needed for full parity with batch
    val q = Streaming.sessionize(stream.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("complete").format("memory").queryName("fs_sess").start()
    try {
      q.processAllAvailable()
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))
      val streamed = spark.table("fs_sess").collect().map(key).toSet
      val batch = Streaming.sessionize(Tables.events(spark, sf0001)).collect().map(key).toSet
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("ST6 file-source: stateful sessionization emits gap-broken + timed-out sessions") {
    import spark.implicits._
    val tsUs = (t: java.sql.Timestamp) => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def asEv(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .as[Streaming.Ev]
    val events = Tables.events(spark, sf0001)
    val sessKey = (s: Streaming.SessionOut) =>
      (s.user_id, tsUs(s.session_start), tsUs(s.session_end), s.n_events, s.sum_value)

    // Expected set, from the SAME operator run in batch (identical
    // per-user fold order → bit-identical sums, no rounding tolerance):
    // batch execution fires no timeouts, so it yields exactly the
    // GAP-BROKEN sessions (all but each user's trailing one). Adding a
    // far-future zero sentinel per user gap-breaks every trailing
    // session too, yielding ALL sessions; the set difference is the
    // per-user trailing sessions, of which the stream's terminal
    // watermark (max ts - 10 min, in Spark's millisecond watermark
    // arithmetic) times out exactly those it strictly passed.
    val gapBroken = Streaming.statefulSessions(asEv(events)).collect().toSet
    val maxUs = events.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val sentinels = events.select(col("user_id")).distinct()
      .withColumn("ts", timestamp_micros(lit(maxUs + 2L * 86400000000L)))
      .withColumn("value", lit(0.0))
      .withColumn("event_id", lit(Long.MaxValue))
    val all = Streaming.statefulSessions(asEv(events.select("user_id", "ts", "value", "event_id")
        .unionByName(sentinels.select("user_id", "ts", "value", "event_id"))))
      .collect().filter(s => tsUs(s.session_start) <= maxUs).toSet
    val wmMs = Math.floorDiv(maxUs, 1000L) - 10L * 60000L
    val timedOut = (all -- gapBroken).filter(s => wmMs > Math.floorDiv(tsUs(s.session_end), 1000L))
    val expected = (gapBroken ++ timedOut).map(sessKey)

    val (dir, stream) = eventsStreamDir()
    val q = Streaming.statefulSessions(
        asEv(stream).withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("fs_fmgs").start()
    try {
      q.processAllAvailable() // batch 1: gap-broken sessions emit, watermark advances after
      // nudge: replay the max-ts event as batch 2 — it can only touch
      // its user's (withheld) trailing session; its purpose is letting
      // the timeout sweep run under the batch-1 watermark
      spark.read.schema(Tables.rawEventsSchema(spark, sf0001))
        .parquet(s"$sf0001/events.parquet")
        .orderBy(col("ts").desc).limit(1)
        .write.mode("overwrite").parquet(dir.resolve("nudge.parquet").toString)
      q.processAllAvailable() // batch 2: timed-out sessions flush
      val streamed = spark.table("fs_fmgs").as[Streaming.SessionOut]
        .collect().map(sessKey).toSet
      assert(timedOut.nonEmpty, "terminal watermark should time out at least one session")
      assert(streamed == expected,
        s"stream-only: ${(streamed -- expected).take(3)}; expected-only: ${(expected -- streamed).take(3)}")
    } finally q.stop()
  }

  test("ST7 file-source: stream-stream band join over the real events parquet matches batch") {
    val (_, stream) = eventsStreamDir()
    val joined = Streaming.clickToPurchase(
      stream.filter(col("event_type") === "click").withWatermark("ts", "10 minutes"),
      stream.filter(col("event_type") === "purchase").withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("fs_band").start()
    try {
      q.processAllAvailable() // inner-join matches emit within the batch
      val streamed = spark.table("fs_band").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      val batch = graft.ops.Events.streamJoin(spark, sf0001).collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("ST9 file-source: LEFT OUTER band join emits matches plus watermark-flushed null rows") {
    val (dir, stream) = eventsStreamDir()
    val joined = Streaming.clickToPurchaseOuter(
      stream.filter(col("event_type") === "click").withWatermark("ts", "10 minutes"),
      stream.filter(col("event_type") === "purchase").withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("fs_outer").start()
    try {
      q.processAllAvailable() // batch 1: matches emit, watermark still 0 → no null rows yet
      // the ST4 nudge: re-deliver the max-ts event so batch 2 runs
      // under the terminal watermark (max_ts − 10 min) and flushes the
      // closed-window unmatched clicks as null rows. The duplicate
      // event can only re-create already-emitted (click_id,
      // purchase_id) pairs — harmless under the set comparison — or
      // sit in open state that never flushes before the stop.
      spark.read.schema(Tables.rawEventsSchema(spark, sf0001))
        .parquet(s"$sf0001/events.parquet")
        .orderBy(col("ts").desc).limit(1)
        .write.mode("overwrite").parquet(dir.resolve("nudge.parquet").toString)
      q.processAllAvailable()
      val rows = spark.table("fs_outer").collect()
      val streamedMatched = rows.filter(!_.isNullAt(2))
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      val streamedNull = rows.filter(_.isNullAt(2)).map(_.getLong(1)).toSet
      val batch = graft.ops.Events.streamJoinOuter(spark, sf0001).collect()
      val batchMatched = batch.filter(!_.isNullAt(2))
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      val batchNullRows = batch.filter(_.isNullAt(2))
      assert(streamedMatched == batchMatched, "matched pairs must equal the batch inner set")
      assert(streamedNull.nonEmpty, "some unconverted clicks must have flushed")
      assert(streamedNull.subsetOf(batchNullRows.map(_.getLong(1)).toSet),
        "every stream null-click must be batch-unmatched")
      // a click whose 10-min join window closed a safe margin before
      // the final watermark MUST have flushed. Each side's watermark
      // advances from the events that REACH its watermark node (the
      // type filter sits upstream), so the global watermark is
      // min(max click ts, max purchase ts) − 10 min; the extra minute
      // keeps boundary semantics out of the assertion
      val ev = Tables.events(spark, sf0001)
      def maxTsOf(t: String): Long = ev.filter(col("event_type") === t)
        .agg(org.apache.spark.sql.functions.max(col("ts")))
        .collect()(0).getTimestamp(0).getTime
      val wmMs = math.min(maxTsOf("click"), maxTsOf("purchase")) - 10 * 60 * 1000
      val mustFlush = batchNullRows
        .filter(_.getTimestamp(3).getTime + 11 * 60 * 1000 < wmMs)
        .map(_.getLong(1)).toSet
      assert(mustFlush.subsetOf(streamedNull),
        s"closed-window clicks never flushed: ${(mustFlush -- streamedNull).take(5)}")
    } finally q.stop()
  }

  test("ST5 file-source: dropDuplicatesWithinWatermark over the doubled events parquet matches the batch dedup face") {
    // the dedup face's declared input is the events relation doubled
    // (q_stream_dedup unions it with itself); here the doubling is two
    // IDENTICAL FILES arriving as separate micro-batches — the exact
    // replay/at-least-once shape streaming dedup exists for. Duplicate
    // timestamps equal their originals, so every duplicate is within
    // the watermark delay of its first occurrence: state-based dedup
    // (or the late-data filter, for rows the batch-1 watermark already
    // passed — both are the ST5 contract) must yield exactly one row
    // per event_id, the batch face's first-event-wins relation.
    val dir = java.nio.file.Files.createTempDirectory("evdedup")
    for (n <- Seq("copy1.parquet", "copy2.parquet")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve(n))
    }
    val stream = Tables.normalizeTs(
      spark.readStream.schema(Tables.rawEventsSchema(spark, sf0001))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val q = stream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("memory").queryName("fs_dedup").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fs_dedup").collect()
        .map(_.getAs[Long]("event_id"))
      val ev = Tables.events(spark, sf0001)
        .select("event_id", "ts", "user_id", "event_type")
      val batch = Streaming.dedupEvents(ev.unionByName(ev)).collect()
        .map(_.getAs[Long]("event_id"))
      assert(streamed.length == streamed.distinct.length,
        "stream output must hold no duplicate event_ids")
      assert(streamed.toSet == batch.toSet,
        s"stream ${streamed.length} ids vs batch ${batch.length}")
    } finally q.stop()
  }

  test("ST4 file-source: append-mode watermark drop over the real events parquet matches tumblingClosed") {
    // the real-file rendering of the tumblingClosed parity test: batch
    // 1 ingests the corpus (watermark still 0 → nothing emits), a
    // nudge file re-delivers the max-ts event so batch 2 runs under
    // the terminal watermark max(ts) − 10 min and flushes exactly the
    // CLOSED windows — the rows tumblingClosed (q_stream_watermark's
    // batch face) computes declaratively. The nudge's duplicate event
    // can only touch its own still-open window, which never emits.
    val (dir, stream) = eventsStreamDir()
    val q = Streaming.tumblingCounts(stream.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("fs_wm").start()
    try {
      q.processAllAvailable()
      spark.read.schema(Tables.rawEventsSchema(spark, sf0001))
        .parquet(s"$sf0001/events.parquet")
        .orderBy(col("ts").desc).limit(1)
        .write.mode("overwrite").parquet(dir.resolve("nudge.parquet").toString)
      q.processAllAvailable()
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[java.sql.Timestamp]("ws"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
      val streamed = spark.table("fs_wm").collect().map(key).toSet
      val batch = Streaming.tumblingClosed(Tables.events(spark, sf0001))
        .collect().map(key).toSet
      assert(streamed.nonEmpty, "terminal watermark must close at least one window")
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("session gap boundary: exactly 30 minutes merges, beyond splits") {
    import spark.implicits._
    def sessionsFor(gapTs: String): Long =
      Streaming.sessionize(Seq(
        (t("2024-01-01 10:00:00"), 7L, 1.0),
        (t(gapTs), 7L, 1.0)).toDF("ts", "user_id", "value"))
        .count()
    assert(sessionsFor("2024-01-01 10:30:00") == 1L, "gap == 30min: still merges")
    assert(sessionsFor("2024-01-01 10:30:01") == 2L, "gap > 30min: new session")
  }

  test("window boundaries are start-inclusive, end-exclusive") {
    import spark.implicits._
    // tumbling: an event exactly on the hour belongs to ITS hour
    val tumb = Streaming.tumblingCounts(Seq(
      (t("2024-01-01 11:00:00"), "click", 1.0)).toDF("ts", "event_type", "value"))
      .collect()
    assert(tumb.length == 1 &&
      tumb.head.getAs[java.sql.Timestamp]("ws") == t("2024-01-01 11:00:00"))
    // sliding 1h/15m: an event on the slide grid lands in exactly 4
    // windows, the newest starting at its own timestamp
    val slid = Streaming.slidingCounts(Seq(
      (t("2024-01-01 11:00:00"), "click", 1.0)).toDF("ts", "event_type", "value"))
      .collect().map(_.getAs[java.sql.Timestamp]("ws")).sortBy(_.getTime)
    assert(slid.length == 4, slid.mkString(";"))
    assert(slid.head == t("2024-01-01 10:15:00")) // 10:00 window excluded (end == ts)
    assert(slid.last == t("2024-01-01 11:00:00"))
  }

  test("moving-average RANGE frame includes the row exactly 24h back") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, t("2024-01-01 00:00:00"), 10.0),
      (2L, t("2024-01-02 00:00:00"), 20.0),   // exactly 24h later: in frame
      (3L, t("2024-01-02 00:00:01"), 30.0))   // 24h+1s after row 1: row 1 out
      .toDF("event_id", "ts", "value").withColumn("user_id", lit(1L))
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-86400000000L, 0L)
    val avgs = rows.withColumn("m", round(sum(col("value")).over(w), 2) / count(col("value")).over(w))
      .orderBy("event_id").collect().map(_.getAs[Double]("m"))
    assert(avgs(1) == 15.0, s"24h-back row must be in frame: ${avgs.toSeq}")
    assert(avgs(2) == 25.0, s"row beyond 24h must be excluded: ${avgs.toSeq}")
  }

  test("genuinely unbounded rate-micro-batch source streams micro-batches until stopped") {
    // file-source streams are bounded by what's on disk; this source
    // NEVER ends — the query consumes deterministic micro-batches
    // (rowsPerBatch=5, values 0,1,2,... with fixed timestamps from
    // startTimestamp) until the test stops it. The engine-side claim:
    // the same transform functions run against a truly unbounded
    // plan, and the harness controls lifecycle, not EOF.
    import org.apache.spark.sql.functions._
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "5")
      .option("startTimestamp", "0")
      .load()
      .select(col("timestamp").as("ts"), col("value"))
      .withColumn("bucket", (col("value") % 5).cast("int"))
      .writeStream.format("memory").queryName("rate_sink")
      .outputMode("append").start()
    try {
      // NOT processAllAvailable(): on an unbounded rate source the
      // available offset keeps advancing with wall time, so "all
      // available" may never be reached — poll the sink instead.
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("rate_sink").count() < 15 &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
      }
      val rows = spark.table("rate_sink")
      assert(rows.count() >= 15, "three micro-batches must have arrived")
      // deterministic content: values are exactly 0..n-1, no gaps/dups
      val vals = rows.select(col("value")).collect().map(_.getLong(0)).sorted
      assert(vals.toSeq == (0L until vals.length).toSeq, vals.take(20).toSeq)
      assert(q.isActive, "the source must still be live — it is unbounded")
    } finally q.stop()
  }

  test("checkpointed query restarts exactly-once from a file source") {
    import org.apache.spark.sql.functions._
    val srcDir = java.nio.file.Files.createTempDirectory("ckptsrc")
    val outDir = java.nio.file.Files.createTempDirectory("ckptout").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v DOUBLE")

    def writeBatch(name: String, ids: Range): Unit = {
      import spark.implicits._
      ids.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/$name")
    }
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .withColumn("doubled", col("v") * 2)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    try {
      writeBatch("b1", 0 until 10)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(spark.read.parquet(outDir).count() == 10)

      // new data lands while no query is running; restart from checkpoint
      writeBatch("b2", 10 until 25)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.read.parquet(outDir)
      assert(out.count() == 25, "restart must process only the new batch, no dups")
      assert(out.select(countDistinct(col("id"))).collect().head.getLong(0) == 25)
    } finally {
      // checkpoint + source + sink state would otherwise pile up in /tmp
      for (d <- Seq(srcDir.toString, outDir, ckpt)) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      }
    }
  }

  test("stream-stream band join matches the batch range join, watermark-bounded") {
    implicit val ctx = spark.sqlContext
    val clicksMem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val buysMem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    def named(m: MemoryStream[(java.sql.Timestamp, Long, Long)]) =
      m.toDF.toDF("ts", "user_id", "event_id").withWatermark("ts", "10 minutes")
    val joined = Streaming.clickToPurchase(named(clicksMem), named(buysMem))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try {
      clicksMem.addData(
        (t("2024-01-01 00:00:00"), 1L, 100L),
        (t("2024-01-01 00:20:00"), 1L, 101L),
        (t("2024-01-01 00:00:00"), 2L, 102L))
      buysMem.addData(
        (t("2024-01-01 00:05:00"), 1L, 200L), // 5m after click 100: matches
        (t("2024-01-01 00:25:00"), 1L, 201L), // 5m after click 101: matches
        (t("2024-01-01 00:30:00"), 2L, 202L)) // 30m after click 102: outside band
      q.processAllAvailable()
      val got = spark.table("ssjoin").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(got == Set((100L, 200L), (101L, 201L)), got.mkString(";"))

      // the same inputs through the batch face must agree
      import spark.implicits._
      import org.apache.spark.sql.functions.lit
      def batchSide(rows: Seq[(java.sql.Timestamp, Long, Long)], et: String) =
        rows.toDF("ts", "user_id", "event_id").withColumn("event_type", lit(et))
      val batch = graft.ops.Joins.rangeCore(
        batchSide(Seq(
          (t("2024-01-01 00:00:00"), 1L, 100L),
          (t("2024-01-01 00:20:00"), 1L, 101L),
          (t("2024-01-01 00:00:00"), 2L, 102L)), "click").unionByName(
          batchSide(Seq(
            (t("2024-01-01 00:05:00"), 1L, 200L),
            (t("2024-01-01 00:25:00"), 1L, 201L),
            (t("2024-01-01 00:30:00"), 2L, 202L)), "purchase")))
        .collect().map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(got == batch, s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("session windows merge events within the gap, streaming") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "value")
    val agg = Streaming.sessionize(events.withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    try {
      mem.addData(
        (t("2024-01-01 00:00:00"), 1L, 1.0),
        (t("2024-01-01 00:10:00"), 1L, 2.0),  // same session (gap 10m < 30m)
        (t("2024-01-01 01:30:00"), 1L, 3.0))  // new session
      q.processAllAvailable()
      mem.addData((t("2024-01-01 05:00:00"), 2L, 0.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sess").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
      assert(sessions.length == 2, sessions.mkString(";"))
      assert(sessions(0).getAs[Long]("n_events") == 2L)
      // session end = last event + gap
      assert(sessions(0).getAs[java.sql.Timestamp]("session_end") == t("2024-01-01 00:40:00"))
      assert(sessions(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("IVM view: after every micro-batch the maintained view equals a batch recompute on the prefix") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double, Long)]
    val events = mem.toDF.toDF("user_id", "ts", "value", "event_id")
      .as[Streaming.Ev]
    val q = Streaming.maintainView(events).toDF()
      .writeStream.outputMode("append").format("memory").queryName("ivm").start()
    // current view = the max-n_versions emission per user (n is
    // strictly monotone per key across micro-batches)
    def view(): Map[Long, (Long, Long, Long, Long)] =
      spark.table("ivm").collect()
        .map(r => (r.getAs[Long]("user_id"), (r.getAs[Long]("n_versions"),
          r.getAs[Long]("sum_cents"), r.getAs[Long]("last_event_id"),
          r.getAs[Long]("last_value_cents"))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
    // batch recompute of the same view over a prefix of the feed —
    // the E4-compaction face extended with the aggregate counters
    def recompute(fed: Seq[(Long, java.sql.Timestamp, Double, Long)]) =
      fed.groupBy(_._1).map { case (u, es) =>
        val cents = es.map(e => math.round(e._3 * 100))
        val last = es.maxBy(e => (e._2.getTime, e._4))
        u -> (es.size.toLong, cents.sum, last._4, math.round(last._3 * 100))
      }
    try {
      val b1 = Seq(
        (1L, t("2024-01-01 00:05:00"), 1.25, 10L),
        (1L, t("2024-01-01 00:10:00"), 2.50, 11L),
        (2L, t("2024-01-01 00:07:00"), 5.00, 20L))
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(view() == recompute(b1), s"${view()} vs ${recompute(b1)}")
      // batch 2: a LATE version for user 1 (older than held state)
      // must land its +delta WITHOUT regressing the latest slot; a
      // fresh user appears; user 2 advances normally
      val b2 = Seq(
        (1L, t("2024-01-01 00:01:00"), 0.75, 9L),
        (2L, t("2024-01-01 00:30:00"), 6.00, 21L),
        (3L, t("2024-01-01 00:02:00"), 4.00, 30L))
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(view() == recompute(b1 ++ b2), s"${view()} vs ${recompute(b1 ++ b2)}")
      val u1 = view()(1L)
      assert(u1 == (3L, 450L, 11L, 250L),
        s"late delta must count, latest must stay event 11: $u1")
    } finally q.stop()
  }

  test("retraction stream: superseded versions emit with provenance, late versions retract on arrival") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double, Long)]
    val events = mem.toDF.toDF("user_id", "ts", "value", "event_id")
      .as[Streaming.Ev]
    val q = Streaming.retractions(events).toDF()
      .writeStream.outputMode("append").format("memory").queryName("retr").start()
    try {
      mem.addData(
        (1L, t("2024-01-01 00:05:00"), 1.0, 10L),
        (1L, t("2024-01-01 00:10:00"), 2.0, 11L),
        (2L, t("2024-01-01 00:07:00"), 5.0, 20L))
      q.processAllAvailable()
      val b1 = spark.table("retr").collect()
      // user 1's first version superseded in-batch; user 2 holds state
      assert(b1.length == 1, b1.mkString(";"))
      assert(b1.head.getAs[Long]("user_id") == 1L &&
        b1.head.getAs[Long]("retracted_event") == 10L &&
        b1.head.getAs[Long]("superseded_event") == 11L, b1.head.toString)
      // batch 2: a LATE version for user 1 (older than its state) is
      // stale on arrival → retracted by the CURRENT state, not by its
      // in-order successor; user 2's held version is now superseded
      mem.addData(
        (1L, t("2024-01-01 00:01:00"), 0.5, 9L),
        (2L, t("2024-01-01 00:30:00"), 6.0, 21L))
      q.processAllAvailable()
      val rows = spark.table("retr").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("retracted_event"),
          r.getAs[Long]("superseded_event"))).toSet
      assert(rows == Set((1L, 10L, 11L), (1L, 9L, 11L), (2L, 20L, 21L)), rows.toString)
    } finally q.stop()
  }
}
