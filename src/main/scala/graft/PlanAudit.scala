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
        val df = fn(spark, sfDir)
        // execute THIS QueryExecution (a noop write would build its own
        // around the write command, leaving df's AdaptiveSparkPlanExec
        // unexecuted → toString would show the pre-adaptive plan with
        // reuse/coalescing missing — the exact features being audited)
        val qe = df.queryExecution
        qe.toRdd.foreach(_ => ())
        // AdaptiveSparkPlan.toString appends the pre-adaptive plan
        // under "== Initial Plan ==" — keep only the final plan or
        // every feature double-counts
        val full = qe.executedPlan.toString
        val p = full.indexOf("== Initial Plan ==") match {
          case -1 => full
          case i => full.substring(0, i)
        }
        def n(pat: String) = pat.r.findAllIn(p).length
        // memscans should stay 0 everywhere since r4 removed all
        // query-local persists (CacheHygieneSpec enforces it) — a
        // nonzero value here means a cached intermediate crept back
        // in, and its InMemoryRelation would overcount the other
        // columns (the BUILD plan prints once per reference)
        println(f"$name%-28s shuffles=${n("Exchange hashpartitioning")}%-3d " +
          f"rangeX=${n("Exchange rangepartitioning")}%-2d reused=${n("ReusedExchange")}%-3d " +
          f"scans=${n("Scan parquet")}%-3d memscans=${n("InMemoryTableScan")}%-2d " +
          f"explodes=${n("Generate explode")}%-2d " +
          f"bcast=${n("BroadcastExchange")}%-2d codegen=${n("\\*\\(")}%d")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s FAILED: ${String.valueOf(e.getMessage).take(80)}")
      } finally {
        spark.catalog.clearCache() // don't audit query N against N-1's caches
        ops.Graph.clearLpaMemo() // audit the cold plan, not the memoized leaf
      }
    }
    spark.stop()
  }
}
