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

  /** Build a DataFrame from a custom LogicalPlan (classic.Dataset.ofRows
    * is private[sql] — same escape-hatch rationale as above; used by the
    * graft.plans custom-operator surface).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
