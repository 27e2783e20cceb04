package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the `Column(expr)` constructor `private[sql]` (Columns
  * now wrap connect-compatible ColumnNodes). Extension libraries that
  * ship custom expressions bridge from inside the `org.apache.spark.sql`
  * package tree — this object is the only code graft places there, and
  * it only re-exports the two conversions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
