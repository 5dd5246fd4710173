package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for constructing `Column`s from custom Catalyst expressions —
  * `classic.ExpressionUtils` is `private[sql]` in Spark 4 (Columns are
  * ColumnNode-backed); this and [[org.apache.spark.ml.tree.NodeAccess]]
  * are the only two places the library reaches into Spark internals.
  * Callers: the native-expression wrappers (`graft.operators.Dedup` /
  * `Similarity`) and `graft.plans.BloomPrune`, which plants a
  * `might_contain(scalar-subquery(bloom_filter_agg))` predicate that has
  * no public Column/SQL surface. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
