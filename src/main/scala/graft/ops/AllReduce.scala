package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational rendering of the distributed-training dataflow
  * (SURVEY.md §2.15; reference `assignment2/part2{a,b}/main.py`):
  * shard → per-worker local reduce → global mean, i.e. the
  * gather/mean of `part2a/main.py:57-72` and the all-reduce-SUM of
  * `part2b/main.py:47-49`, with Spark's partial aggregation playing
  * the combiner role DDP's gradient bucketing plays
  * (`part3/main.py:105`).
  *
  * Embeddings stand in for per-sample gradients; `pmod(vec_id, 4)`
  * is the DistributedSampler shard (`part2a/main.py:133`). The
  * element-wise array aggregation goes through posexplode →
  * (worker, pos) partial sums → per-pos mean: flat narrow rows, fully
  * codegen'd, shuffle keyed on 64·4 groups — the same shape works for
  * million-parameter vectors since state per group is one double. */
object AllReduce {

  def gradAllreduce(s: SparkSession, d: String): DataFrame = {
    val shards = Tables.embeddings(s, d)
      .select(pmod(col("vec_id"), lit(4L)).as("worker"),
        posexplode(transform(col("embedding"), x => x.cast("double"))))
      .toDF("worker", "pos0", "g")
    val workerSums = shards
      .groupBy(col("worker"), (col("pos0") + 1).as("pos"))
      .agg(sum(col("g")).as("wsum"))
    workerSums
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n_workers"),
        round(sum(col("wsum")) / count(lit(1)), 6).as("grad_mean"))
      .orderBy(col("pos"))
  }

  /** The typed-UDAF rendering of the same dataflow: per-worker
    * element-wise mean via [[graft.functions.ArrayMean]] (whole arrays
    * in the aggregation buffer, merged associatively — partial→final
    * like a combiner), then exploded for the oracle compare. The two
    * renderings bracket the design space: array-buffer wins for few
    * groups × long vectors, the posexplode form for huge group
    * counts. */
  def gradAllreduceTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.embeddings(s, d)
      .select(pmod(col("vec_id"), lit(4L)).as("worker"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
    ds.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.ArrayMean.toColumn.name("mean_vec"))
      .toDF("worker", "mean_vec")
      .select(col("worker"), posexplode(col("mean_vec")))
      .toDF("worker", "pos0", "g")
      .select(col("worker"), (col("pos0") + 1).as("pos"), round(col("g"), 6).as("grad_mean"))
      .orderBy(col("worker"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grad_allreduce" -> gradAllreduce,
    "q_grad_allreduce_typed" -> gradAllreduceTyped,
  )

  val oracles: Map[String, String] = Map(
    "q_grad_allreduce" ->
      """WITH shards AS (
           SELECT vec_id % 4 AS worker, unnest(range(1, 65)) AS pos, embedding
           FROM embeddings),
         vals AS (SELECT worker, CAST(pos AS INT) AS pos, CAST(embedding[pos] AS DOUBLE) AS g FROM shards),
         wsums AS (SELECT worker, pos, sum(g) AS wsum FROM vals GROUP BY worker, pos)
         SELECT CAST(pos AS INT) AS pos, count(*) AS n_workers,
                round(sum(wsum) / count(*), 6) AS grad_mean
         FROM wsums GROUP BY pos ORDER BY pos""",
    "q_grad_allreduce_typed" ->
      """WITH shards AS (
           SELECT vec_id % 4 AS worker, unnest(range(1, 65)) AS pos, embedding
           FROM embeddings)
         SELECT worker, CAST(pos AS INT) AS pos,
                round(avg(CAST(embedding[pos] AS DOUBLE)), 6) AS grad_mean
         FROM shards GROUP BY worker, pos ORDER BY worker, pos""",
  )
}
