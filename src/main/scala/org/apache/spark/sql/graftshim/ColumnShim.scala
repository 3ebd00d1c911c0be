package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for custom
  * Catalyst expressions (Spark 4 moved `new Column(expr)` behind
  * ColumnNode plumbing; `classic.ExpressionUtils` is the blessed
  * internal path — see org.apache.spark.sql.classic.columnNodeSupport).
  * This file lives in the org.apache.spark.sql package solely to
  * satisfy the `private[sql]` access; it contains no Spark code. */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge into `private[sql]` Dataset construction from a hand-built
  * logical plan (custom operators need `Dataset.ofRows`, which Spark 4
  * keeps behind `classic`). Same package-placement rationale as
  * [[ColumnShim]]. */
object DatasetShim {
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
