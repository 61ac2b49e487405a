package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion lives in `private[sql]` ExpressionUtils. This
  * bridge (in the org.apache.spark.sql namespace, the standard pattern for
  * Catalyst extension libraries) exposes exactly the two conversions the
  * graft.expr package needs and nothing else. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
