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
}
