package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the (`private[sql]`) Column <-> Expression
  * bridge, so graft operators can wrap a column in a catalyst node that
  * has no public DSL surface (e.g. `AssertNotNull`, which is how an
  * operator restores provably-non-nullable schema after an aggregate
  * widened it). Counterpart of [[RegistryBridge]] for ad-hoc expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
