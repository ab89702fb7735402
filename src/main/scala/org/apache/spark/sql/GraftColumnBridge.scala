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
}
