package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column <-> Expression converters in
  * Spark 4 (`org.apache.spark.sql.classic.ExpressionUtils`) so the engine's
  * native Catalyst expressions (e.g. `graft.plans.SpanInvariantPred`) can be
  * exposed as user-facing `Column`s. Same mechanism Spark's own extensions
  * use; no Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
