package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * that ship native Catalyst expressions use a package-qualified shim
  * like this one — the same technique Spark's own connector/extension
  * modules use. Nothing else in this package; all engine code lives
  * under `graft.*`.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
