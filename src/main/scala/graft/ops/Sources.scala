package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink fidelity to the reference (SURVEY.md §2.1):
  * `assignment1/part2/task.py` reads CSV with header + schema
  * inference, globally sorts by (cca2, timestamp), and writes CSV
  * with header. The harness queries run on parquet; this module keeps
  * the reference's own I/O path alive and golden-tested.
  *
  * Directory inputs glob natively (S3 — the reference points Spark at
  * an HDFS directory, `task1/task1.sh:7`); text-line scan (S2) lives
  * in [[PageRank.parseEdgeLines]].
  */
object Sources {

  /** CSV scan exactly as the reference does it (`task.py:22`):
    * header + inferSchema. Explicit schemas are preferred everywhere
    * else — inference costs an extra eager sample pass per read. */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** The reference flagship end-to-end (`task.py:22-26`): CSV in →
    * global multi-column ascending sort → CSV out with header. The
    * sort plans as sample → RangePartitioning → per-partition
    * SortExec: one shuffle, totally ordered output files, no driver
    * bottleneck at any scale. */
  def csvSort(s: SparkSession, inPath: String, outPath: String,
      sortCols: Seq[String] = Seq("cca2", "timestamp")): Unit =
    readCsv(s, inPath)
      .orderBy(sortCols.map(c => col(c).asc): _*)
      .write.option("header", "true").mode("overwrite").csv(outPath)

  /** JSON-lines scan with an EXPLICIT schema (the canonical LLM-corpus
    * interchange format). No inference: at 100 TB an inference pass is
    * a full extra read, and a drifting inferred schema is a silent
    * contract change — the schema is an argument, corrupt rows land in
    * PERMISSIVE-mode nulls rather than killing the job. */
  def readJsonl(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** JSON-lines sink — one object per line, written per-partition in
    * parallel like every other sink. */
  def writeJsonl(df: DataFrame, outPath: String): Unit =
    df.write.mode("overwrite").json(outPath)
}
