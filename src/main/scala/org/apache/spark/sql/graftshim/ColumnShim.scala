package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst Expressions and the public Column API.
  *
  * Spark 4 made the Expression<->Column conversions `private[sql]`
  * (columnNodeSupport.scala) as part of the Connect refactor; a
  * library adding native expressions needs this shim in the sql
  * package namespace — the same access trick every Spark extension
  * library uses.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
