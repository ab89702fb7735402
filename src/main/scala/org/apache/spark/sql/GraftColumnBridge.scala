package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column↔Expression converters `private[sql]`
  * (`classic.ExpressionUtils`); this is the minimal in-package bridge
  * that lets graft's native expressions (e.g.
  * `graft.functions.CosineSimilarity`) surface as Columns. */
object GraftColumnBridge {
  def wrap(a: Column, b: Column)(f: (Expression, Expression) => Expression): Column =
    ExpressionUtils.column(
      f(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def wrap1(a: Column)(f: Expression => Expression): Column =
    ExpressionUtils.column(f(ExpressionUtils.expression(a)))

  /** Rebuild a (typically just-checkpointed) DataFrame as a fresh leaf
    * over the SAME execution RDD, discarding inherited statistics.
    *
    * Spark 4's `Dataset.localCheckpoint` truncates the lineage but
    * PRESERVES the source plan's stats estimate in the new
    * `LogicalRDD`. In an iterative algorithm that self-joins the
    * loop-carried relation (pointer-jumping CC), each round's estimate
    * is a product over the previous round's — the estimate compounds
    * exponentially, and after ~7 rounds the driver spends its time in
    * BigInteger math inside stats visitors (observed: minutes inside
    * `InjectRuntimeFilter` before any job started). Re-wrapping through
    * `internalCreateDataFrame` (private[sql], hence this bridge) keeps
    * the materialized RDD — no recompute, no extra job — but resets
    * stats to the conservative leaf default, making every round's
    * estimate O(1)-sized. */
  def freshLeaf(df: Dataset[Row]): Dataset[Row] = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** `bloom_filter_agg` as a Column: Spark ships the aggregate that
    * builds a `util.sketch.BloomFilter` over xxhash64'd keys (it is
    * what `InjectRuntimeFilter` plants for its own runtime filters,
    * `catalyst.optimizer.InjectRuntimeFilter`), but leaves it out of
    * the public function registry — this bridge exposes it so the
    * engine can build EXPLICIT semi-join pushdown filters. `child`
    * must already be an xxhash64 (LongType) column, mirroring the
    * optimizer's own usage. */
  def bloomFilterAgg(child: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(child),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain` probe against a 1-row [[bloomFilterAgg]] relation;
    * `value` must be the same xxhash64 rendering the filter was built
    * over. The filter side must analyze as a SCALAR SUBQUERY (the
    * expression rejects plain input columns) — exactly how
    * `InjectRuntimeFilter` plants its own probes, and what makes the
    * build side execute once as a subquery stage whose result ships to
    * every probe task. False positives possible, false negatives
    * never — callers must re-verify positives with an exact join. */
  def bloomMightContain(bloom: Dataset[Row], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      catalyst.expressions.ScalarSubquery(bloom.queryExecution.analyzed),
      ExpressionUtils.expression(value)))

  /** Whether `key` was EXPLICITLY set on this session (builder conf,
    * spark-defaults, or runtime set) as opposed to merely having a
    * registered default. `RuntimeConfig.getOption` returns the default
    * of a registered entry, so it cannot make this distinction —
    * `SQLConf.contains` (private[sql] session state) checks only the
    * explicit settings map. */
  def isConfExplicitlySet(spark: SparkSession, key: String): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.contains(key)
}
