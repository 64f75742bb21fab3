package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * split Column off to a ColumnNode facade; classic conversions live
  * behind `org.apache.spark.sql.classic.ExpressionUtils`). This is the
  * one sanctioned-pattern seam this engine opens into Spark internals,
  * used only to surface native Catalyst expressions
  * (graft.functions.DoubleDot) as Columns without requiring session
  * function registration.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
