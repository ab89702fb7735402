package graft

import org.apache.spark.sql.SparkSession

/** Entry smoke under a FRESH, deliberately unconfigured session (the
  * verify recipe's step 3): `SparkEntry.entry` must work without the
  * harness confs — in particular `Tables.events` must self-set the
  * nanos-timestamp legacy flag — and a session that explicitly
  * disables the flag must get the loud failure, not a silent
  * override. Prints ENTRY_ROWS=n and GUARD=LOUD on success. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val guard =
      try { Tables.events(spark, "/root/testdata/sf0.001"); "NOT_LOUD" }
      catch { case _: IllegalStateException => "LOUD" }
    println(s"GUARD=$guard")
    spark.stop()
    if (n <= 0 || guard != "LOUD") sys.exit(1)
  }
}
