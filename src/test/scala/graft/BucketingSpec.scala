package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing (SURVEY.md §2.13 / the co-located join story): writing
  * both join sides bucketed by the join key lets Spark plan a
  * sort-merge join with NO shuffle exchange — the pre-partitioning
  * that makes repeated 100 TB fact-fact joins affordable. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without a shuffle exchange") {
    // external table paths: the (static) warehouse dir never gets used
    val wh = Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf0001).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")

    // tiny test tables would broadcast; force the SMJ path the
    // pattern targets at scale (restored in finally — the shared
    // session outlives this suite)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (rows, plan) =
      try {
        val joined = spark.table("b_orders")
          .join(spark.table("b_lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        // execute THIS DataFrame so its adaptive plan finalizes
        val r = joined.collect()
        (r, joined.queryExecution.executedPlan.toString)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    assert(rows.nonEmpty)
    val joinSection = plan.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }
}
