package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * graft's access bridge into the sql-private Expression ↔ Column
 * converters. Spark 4's public `Column` wraps a connect-compatible
 * `ColumnNode`, and building one from a raw Catalyst `Expression` (needed
 * for programmatically-constructed expressions that carry non-literal
 * state, e.g. [[graft.functions.BpeSegmentWordsExpr]]'s broadcast
 * handles, which the function-registry path cannot express) goes through
 * `classic.ExpressionUtils`, which is `private[sql]` — hence this one
 * object in the sql package namespace. No Spark internals are modified;
 * this is the standard extension-shim pattern.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
