package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of a harness SF (r5 verdict task 3):
  * every slope in the record so far is computed on sf0.01→sf0.1,
  * where the big side runs 0.3–10 s and fixed job overhead still
  * flatters sub-linear shapes — this main synthesizes an sf1-scale
  * sibling locally so the heavies' slopes become evidence rather
  * than extrapolation (a TIMING artifact: no new oracle; Bench picks
  * the directory up automatically, see the scale_up section there).
  *
  * Scheme: each fact table becomes `factor` disjoint shards — row
  * replication with ALL entity keys offset by shard × 100,000,000
  * (explode of a 0..factor−1 sequence: one narrow pass per table, no
  * shuffle). Key consistency is per-shard (shard r's lineitem
  * references shard r's orders/parts/suppliers), so join fan-outs,
  * per-key history lengths, basket sizes, and graph degrees all stay
  * DATA-TRUE while global cardinalities grow 10× — the growth mode a
  * real corpus has. nation/region stay fixed (the TPC-H convention:
  * dims don't grow with volume). The stride is a multiple of 100 so
  * id-modulus sampling patterns (link-predict focal nodes, KWIC
  * shards) keep their density in every shard. Timestamps are left
  * unchanged: 10× the rows per hour is "more traffic", which is what
  * scale means for the window/stream family. Document texts are left
  * identical across shards — dedup operators see clone groups of
  * exactly `factor`, a bounded (and realistic: crawls duplicate)
  * enrichment, never a quadratic in data size.
  */
object ScaleUp {

  val Stride = 100000000L

  /** Key columns to offset, per table. */
  val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq(), // fixed dims: copied once, never replicated
    "region" -> Seq())

  def scaleTable(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    if (keys.isEmpty) df
    else {
      val exploded = df.withColumn("__shard",
        explode(sequence(lit(0L), lit(factor - 1L))))
      keys.foldLeft(exploded) { (d, k) =>
        d.withColumn(k, col(k) + col("__shard") * Stride)
      }.drop("__shard")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/scale_data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keyCols.foreach { case (t, keys) =>
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      scaleTable(src, keys, factor)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t -> $outDir/$t.parquet")
    }
    spark.stop()
  }
}
