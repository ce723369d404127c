package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`classic.ExpressionUtils`) is private[sql]. This tiny
  * shim lives in an org.apache.spark.sql subpackage purely to re-export the
  * Column ⇄ Expression conversion for graft's custom expressions
  * ([[graft.functions.DotProduct]]). No other internals are touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
