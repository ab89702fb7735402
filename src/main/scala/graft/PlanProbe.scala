package graft

import org.apache.spark.sql.SparkSession

/** Plan-stability probe (dev tool, PlanAudit's sibling): measure ONE
  * query's executed-plan counters repeatedly in a fresh session and
  * print the join/exchange skeleton each run — the tool for localizing
  * a nondeterministic PlanBudgetSpec counter. Found q_modularity's
  * AQE stage-scheduling race (a streamed-side shuffle materializing
  * before the SMJ→BHJ re-plan, 6 vs 7 exchanges run-to-run): run with
  * `sbt "runMain graft.PlanProbe <query> <n>"`, diff the flipping runs'
  * skeletons. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_modularity")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to n) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val c = PlanCounters.measure(df)
      println(s"=== run $i: shuffles=${c.shuffles} bcast=${c.bcast} codegen=${c.codegen}")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate"))
        .mkString("\n"))
      spark.catalog.clearCache()
      ops.Graph.clearMemos()
    }
    spark.stop()
  }
}
