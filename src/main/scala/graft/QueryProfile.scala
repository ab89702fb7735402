package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query job/stage profiler (r11 optimization round, guide §1):
  * runs a declared query with one untimed warm-up then one measured
  * pass through the noop sink, and prints where the wall-clock went —
  * every Spark job (with its trigger callsite) and the heaviest
  * stages (task time, shuffle bytes, callsite). The measurement layer
  * Bench deliberately lacks: Bench answers "how long", this answers
  * "which job/stage/operator".
  *
  * Usage: sbt "runMain graft.QueryProfile q_a,q_b [sfDir]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, t0: Long, var t1: Long = -1L)
    final case class StageRec(id: Int, name: String, tasks: Int,
        taskMs: Long, shufReadB: Long, shufWriteB: Long, wallMs: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.Buffer.empty[StageRec]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) jobs.synchronized { jobs(js.jobId) = JobRec(js.jobId, js.time) }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (collecting) jobs.synchronized { jobs.get(je.jobId).foreach(_.t1 = je.time) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) stages.synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += StageRec(si.stageId, si.name, si.numTasks,
            if (m == null) 0L else m.executorRunTime,
            if (m == null) 0L else m.shuffleReadMetrics.totalBytesRead,
            if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten,
            (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOnce(name: String): Double = {
      spark.catalog.clearCache()
      ops.Graph.clearMemos()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      runOnce(name) // warm-up: JIT + codegen + scan index
      jobs.clear(); stages.clear()
      collecting = true
      val secs = runOnce(name)
      collecting = false
      Thread.sleep(200) // let listener drain
      println(f"\n===== $name: $secs%.2f s, ${jobs.size} jobs, ${stages.size} stages =====")
      val ordered = jobs.values.toSeq.sortBy(_.t0)
      val tQuery0 = ordered.headOption.map(_.t0).getOrElse(0L)
      ordered.foreach { j =>
        println(f"  job ${j.id}%-4d +${j.t0 - tQuery0}%-6d ms  dur ${j.t1 - j.t0}%-6d ms")
      }
      val gaps = ordered.sliding(2).collect {
        case Seq(a, b) if b.t0 - a.t1 > 50 => (a.id, b.id, b.t0 - a.t1)
      }.toSeq
      if (gaps.nonEmpty) {
        println("  driver gaps >50ms between jobs (planning/driver work):")
        gaps.foreach { case (a, b, g) => println(f"    job $a -> $b : $g ms") }
      }
      println("  top stages by task time:")
      stages.sortBy(-_.taskMs).take(14).foreach { s =>
        println(f"    stage ${s.id}%-4d wall ${s.wallMs}%-6d task ${s.taskMs}%-7d ms " +
          f"tasks ${s.tasks}%-3d sr ${s.shufReadB / 1024}%-8d KiB sw ${s.shufWriteB / 1024}%-8d KiB  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
