package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Private-API bridge (the only one besides ml.tree.NodeAccess): wraps a
  * Catalyst `Expression` as a public `Column`. Spark 4 made `Column`
  * implementation-agnostic and moved the Expression wrap behind
  * `private[sql] classic.ExpressionUtils`; graft needs it in exactly one
  * place — planting a `might_contain(scalar-subquery(bloom_filter_agg))`
  * predicate (graft.plans.BloomPrune), an expression shape that has no
  * public Column/SQL surface. */
object ExprColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
}
