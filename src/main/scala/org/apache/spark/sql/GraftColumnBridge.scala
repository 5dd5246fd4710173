package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for constructing `Column`s from custom Catalyst expressions —
  * `classic.ExpressionUtils` is `private[sql]` in Spark 4 (Columns are
  * ColumnNode-backed); this and [[org.apache.spark.ml.tree.NodeAccess]]
  * are the only two places the library reaches into Spark internals. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
