package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's sql namespace: Column ⇄ Expression
  * conversion for the engine's custom Catalyst expressions. These
  * helpers are `private[sql]` upstream; a tiny shim in the sql package
  * is the standard pattern for third-party Catalyst extensions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
