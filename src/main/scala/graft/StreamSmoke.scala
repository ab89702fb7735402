package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming smoke under a real `readStream` (r3 verdict gap #4: all
  * seven ST operators were green via batch faces and stream==batch
  * was spec-pinned, but the driver surface never executed a streaming
  * plan outside ScalaTest). Runs the watermarked tumbling aggregation
  * as an actual file-source stream in APPEND mode and asserts row
  * parity with `Streaming.tumblingClosed` — the batch face that
  * defines exactly the rows an append-mode sink must emit.
  *
  * The flush trick: append mode only emits windows closed by the
  * watermark as of the PREVIOUS batch, so a single-batch stream emits
  * nothing. The nudge file replays the max-ts event as a second batch
  * — it lands in the final window, which the terminal watermark
  * withholds by construction (its end is past max(ts) - delay), so
  * the duplicate can never change an emitted row; its only effect is
  * advancing the watermark so batch 2 flushes every closed window.
  *
  * Prints STREAM_ROWS / BATCH_ROWS / PARITY=OK; exits nonzero on any
  * mismatch. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_smoke")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("batch1.parquet"))

    // the batch face: exactly the append-mode emission contract
    val expected = streaming.Streaming.tumblingClosed(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet

    // readStream needs an explicit schema; rawEventsSchema resolves the
    // file's own footer (whatever ts vintage is on disk, with its own
    // nanos-flag guard — no ordering dependency on the Tables.events
    // call above), then the stream normalizes exactly as Tables.events
    // does
    val schema = Tables.rawEventsSchema(spark, sfDir)
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch:
        // the nudge file must be a SECOND batch or there is no
        // watermark advance to flush the first
        .parquet(dir.toString))
      .withWatermark("ts", "10 minutes")
    val q = streaming.Streaming.tumblingCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("smoke").start()
    try {
      q.processAllAvailable() // batch 1: everything aggregated, nothing emitted yet
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.orderBy(col("ts").desc).limit(1)
        .write.mode("overwrite").parquet(dir.resolve("nudge.parquet").toString)
      q.processAllAvailable() // batch 2: watermark advanced, closed windows flush
      val streamed = spark.table("smoke").collect().map(_.toSeq).toSet
      println(s"STREAM_ROWS=${streamed.size}")
      println(s"BATCH_ROWS=${expected.size}")
      val parity = streamed == expected
      println(s"PARITY=${if (parity) "OK" else "MISMATCH"}")
      if (!parity) {
        (streamed -- expected).take(3).foreach(r => println(s"stream-only: $r"))
        (expected -- streamed).take(3).foreach(r => println(s"batch-only:  $r"))
      }
      if (!parity || streamed.isEmpty) sys.exit(1)
    } finally {
      q.stop()
      spark.stop()
    }
  }
}
