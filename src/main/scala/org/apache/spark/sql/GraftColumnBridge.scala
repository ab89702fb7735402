package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
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

  /** Whether `key` was EXPLICITLY set on this session (builder conf,
    * spark-defaults, or runtime set) as opposed to merely having a
    * registered default. `RuntimeConfig.getOption` returns the default
    * of a registered entry, so it cannot make this distinction —
    * `SQLConf.contains` (private[sql] session state) checks only the
    * explicit settings map. */
  def isConfExplicitlySet(spark: SparkSession, key: String): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.contains(key)
}
