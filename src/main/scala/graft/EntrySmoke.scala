package graft

import org.apache.spark.sql.SparkSession

/** Entry smoke under a FRESH, deliberately unconfigured session (the
  * verify recipe's step 3): `SparkEntry.entry` must work without the
  * harness confs, and `Tables.events` must hand back a session-tz
  * TIMESTAMP `ts` on such a session whatever parquet vintage is on
  * disk (it self-sets the nanos legacy flag when the footer needs
  * it). Prints ENTRY_ROWS=n and EVENTS_TS=timestamp on success. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val tsType = ev.schema("ts").dataType.typeName
    val evRows = ev.count()
    println(s"EVENTS_TS=$tsType")
    spark.stop()
    if (n <= 0 || evRows <= 0 || tsType != "timestamp") sys.exit(1)
  }
}
