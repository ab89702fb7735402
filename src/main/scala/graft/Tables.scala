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
  /** `events.ts` has shipped under two physical parquet types across
    * harness rounds: TIMESTAMP(NANOS) (rounds 1–3; Spark's vectorized
    * reader rejects it unless `spark.sql.legacy.parquet.nanosAsLong`
    * makes it a raw BIGINT) and TIMESTAMP(MICROS, isAdjustedToUTC=
    * false) (round 4+; Spark 4 resolves it as TIMESTAMP_NTZ). Both
    * normalize to the same session-tz TIMESTAMP micros — under the
    * UTC sessions every harness entrypoint builds, the wall-clock
    * values are bit-identical to what DuckDB reads from the same file,
    * so oracles keep hash-matching whichever vintage is on disk.
    *
    * SIDE EFFECT (nanos vintage only): sets the legacy flag on the
    * session if unset, because a fresh unconfigured session cannot
    * even resolve a NANOS footer without it. A session that explicitly
    * sets it false fails loudly inside Spark's own schema converter
    * ("Illegal Parquet type") — the read genuinely requires the flag. */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!org.apache.spark.sql.GraftColumnBridge.isConfExplicitlySet(s, key))
      s.conf.set(key, "true")
    normalizeTs(read(s, d, "events"))
  }

  /** Normalize an events-shaped relation's `ts` column to session-tz
    * TIMESTAMP micros whatever the physical source type was — the
    * single place both vintages (see [[events]]) converge. Pure column
    * arithmetic: stays inside the scan projection, no shuffle. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => // raw nanos under the legacy flag → truncate like DuckDB
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros wall-clock → same instant under UTC sessions
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"unsupported events.ts physical type: $other")
    }
  }
  /** The on-disk (pre-normalization) schema of `events.parquet` — what
    * `readStream.schema(...)` needs, since file streams resolve no
    * footer themselves and [[normalizeTs]] runs AFTER the source. Set
    * apart from the ad-hoc `spark.read.parquet(...).schema` probe it
    * replaces (r4 advice): that probe only resolved the NANOS vintage
    * when an earlier [[events]] call happened to have set the legacy
    * flag on the shared session — this helper carries the same flag
    * guard itself, so callers no longer depend on statement order. */
  def rawEventsSchema(s: SparkSession, d: String): org.apache.spark.sql.types.StructType = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!org.apache.spark.sql.GraftColumnBridge.isConfExplicitlySet(s, key))
      s.conf.set(key, "true")
    read(s, d, "events").schema
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
