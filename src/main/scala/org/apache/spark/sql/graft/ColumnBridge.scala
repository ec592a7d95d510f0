package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported conversion lives in the private[sql] ExpressionUtils. This
  * bridge (in a child package of org.apache.spark.sql, the standard
  * pattern for Spark extension libraries) re-exports just the two
  * conversions the engine needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
