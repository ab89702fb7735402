package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit main (dev tool, not part of the driver
  * contract): prints one line per declared query with the plan
  * features that matter at scale — shuffle count, exchange reuse,
  * parquet scans, explodes, broadcasts, and whole-stage-codegen span
  * count. Run after touching an operator to see whether the plan is
  * still the one you wanted (`sbt "runMain graft.PlanAudit [sfDir]"`;
  * executes each query's own QueryExecution so AQE's final plan is
  * what gets audited, not the initial one).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // PlanCounters executes THIS QueryExecution (a noop write would
        // build its own around the write command, leaving df's
        // AdaptiveSparkPlanExec unexecuted → the pre-adaptive plan with
        // reuse/coalescing missing — the exact features being audited).
        // memscans should stay 0 everywhere since r4 removed all
        // query-local persists (CacheHygieneSpec enforces it) — a
        // nonzero value here means a cached intermediate crept back
        // in, and its InMemoryRelation would overcount the other
        // columns (the BUILD plan prints once per reference)
        val c = PlanCounters.measure(fn(spark, sfDir))
        println(f"$name%-28s shuffles=${c.shuffles}%-3d " +
          f"rangeX=${c.rangeX}%-2d reused=${c.reused}%-3d " +
          f"scans=${c.scans}%-3d memscans=${c.memscans}%-2d " +
          f"explodes=${c.explodes}%-2d " +
          f"bcast=${c.bcast}%-2d codegen=${c.codegen}%d")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s FAILED: ${String.valueOf(e.getMessage).take(80)}")
      } finally {
        spark.catalog.clearCache() // don't audit query N against N-1's caches
        ops.Graph.clearMemos() // audit the cold plan, not the memoized leaf
      }
    }
    spark.stop()
  }
}
