package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's `Column` wraps a `ColumnNode`
  * rather than an `Expression`; the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — this shim (inside the sql package tree) re-exports the
  * two conversions the graft's native Catalyst expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
