package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column↔Expression converters —
  * the supported way for extension libraries to expose custom Catalyst
  * expressions as user-facing Columns in Spark 4.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Eagerly convert a Column to its catalyst Expression (the lazy
    * `expression` wrapper keeps ColumnNodes — e.g. a `.desc` SortOrder —
    * opaque until analysis, which breaks pattern matches on SortOrder). */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
