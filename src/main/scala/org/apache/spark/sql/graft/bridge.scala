package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 hides the classic Column internals
 * behind `private[sql]`; a library shipping its own Catalyst expressions
 * needs exactly these two conversions, so this object lives in the sql
 * package scope on purpose (the conventional extension-library pattern).
 */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
