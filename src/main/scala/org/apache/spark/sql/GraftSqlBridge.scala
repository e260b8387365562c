package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` access bridge.
  *
  * Spark 4's Column API is Connect-agnostic: building a `Column` directly
  * from a Catalyst `Expression` (and reaching the session FunctionRegistry)
  * moved behind `private[sql]` (`classic.ExpressionUtils`). Custom
  * expression libraries conventionally bridge via a tiny object compiled
  * into the sql package. Nothing else in the engine lives outside `graft.*`.
  */
object GraftSqlBridge {

  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  def plan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
