package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the harness parquet testdata (TESTDATA.md).
  *
  * The reference reads CSV with runtime schema inference
  * (`assignment1/part2/task.py:22`); here schemas come from parquet
  * footers, so reads are already pruned/pushed-down by Catalyst — the
  * engine never infers at query time. Loaders are thin on purpose:
  * every query declares its own projection so column pruning reaches
  * the scan (`ReadSchema` in explain).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects outright. Read it as raw nanos and truncate to
    * micros — the same ns→us truncation DuckDB applies, keeping oracle
    * timestamps bit-identical.
    *
    * SIDE EFFECT: sets `spark.sql.legacy.parquet.nanosAsLong` on the
    * session if unset (needed because the harness may hand us a fresh
    * unconfigured session); any nanos-timestamp parquet read later in
    * the same session will also arrive as raw longs. Sessions built by
    * [[Verify]]/[[Bench]]/the test harness set it at construction, so
    * for them this is a no-op. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") match {
      case None => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      case Some("true") => // already usable
      case Some(other) =>
        // never silently clobber an explicit user choice — the read
        // genuinely requires the legacy mode, so say so instead
        throw new IllegalStateException(
          s"events() requires spark.sql.legacy.parquet.nanosAsLong=true to read " +
            s"TIMESTAMP(NANOS) parquet, but the session explicitly sets it to '$other'")
    }
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
