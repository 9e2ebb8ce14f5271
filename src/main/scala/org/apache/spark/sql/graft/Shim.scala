package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Connect refactor made `ExpressionUtils` (and `Column.expr`)
  * `private[sql]`; third-party libraries shipping custom Catalyst
  * expressions use a package-local shim to lift them into the public
  * Column API. This is the only file in the Spark namespace. */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
