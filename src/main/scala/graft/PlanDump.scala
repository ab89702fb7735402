package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-record dev tool (r11 optimization round): writes the
  * `.explain("formatted")` output of named declared queries to
  * `<outDir>/<query>_<suffix>.txt` — the committed before/after
  * evidence for plans/r11. The query is EXECUTED first on its own
  * QueryExecution (the PlanCounters discipline), so the dumped
  * AdaptiveSparkPlan is the final re-optimized one with reuse /
  * coalescing / runtime join strategy visible, not the initial guess.
  *
  * Usage: sbt "runMain graft.PlanDump q_a,q_b <sfDir> <outDir> <suffix>"
  *        (query list "all" dumps every declared query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "/root/repo/plans/r11"
    val suffix = if (args.length > 3) args(3) else "before"
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    new java.io.File(outDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      qe.toRdd.foreach(_ => ()) // final adaptive plan, not the initial one
      val txt = qe.explainString(ExplainMode.fromString("formatted"))
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"wrote ${f.getPath} (${txt.length} chars)")
      spark.catalog.clearCache()
      ops.Graph.clearMemos()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
