package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ catalyst Expression converters
  * (Spark 4.x moved Column onto ColumnNode; `ExpressionUtils` is the
  * sanctioned classic-backend converter). This subpackage placement is the
  * standard technique for libraries that register native Catalyst
  * expressions without a SQL-function registry round-trip. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
