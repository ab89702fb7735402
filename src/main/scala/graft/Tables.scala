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
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // getOption can't distinguish "unset" from the registered default
    // (false), so ask session state whether the key was EXPLICITLY set:
    // unset → self-configure (fresh harness sessions); explicitly true
    // → fine; explicitly false → fail loudly rather than silently
    // clobbering a user's choice (the read genuinely requires it)
    if (!org.apache.spark.sql.GraftColumnBridge.isConfExplicitlySet(s, key))
      s.conf.set(key, "true")
    else if (s.conf.get(key) != "true")
      throw new IllegalStateException(
        s"events() requires $key=true to read TIMESTAMP(NANOS) parquet, " +
          s"but the session explicitly sets it to '${s.conf.get(key)}'")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
