/*
 * Bridge into Spark's private[sql] Column internals: Spark 4 wraps
 * Columns around ColumnNodes, and the Expression <-> Column conversions
 * live in classic.ExpressionUtils. This is the sanctioned pattern for
 * libraries shipping native Catalyst expressions.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def toExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  /** A DataFrame over an already-analyzed logical plan (the captured
    * MERGE source) — `classic.Dataset.ofRows`, bridged.
    */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
  /** Drop the session's cached V2 catalog instances so a re-pointed
    * `spark.sql.catalog.<name>.root` deterministically takes effect —
    * instance invalidation on conf change is otherwise an engine
    * implementation detail a long-lived session must not rely on.
    */
  def resetCatalogs(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.reset()
}
