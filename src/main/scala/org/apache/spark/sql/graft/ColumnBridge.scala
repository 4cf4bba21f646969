package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Escape hatch for custom Catalyst Expressions (SURVEY.md §7.5;
  * SNIPPETS.md package-placement pattern): `ExpressionUtils` is
  * private[sql], so this bridge lives in a subpackage of
  * org.apache.spark.sql to reach it. Everything else in the engine stays
  * in the graft.* packages and goes through these two functions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
