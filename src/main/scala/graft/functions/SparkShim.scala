// Lives under org.apache.spark.sql so it can see the private[sql]
// Column ⇄ Expression bridge — the one hook needed to expose custom Catalyst
// expressions (e.g. graft.functions.SimHash64) as user-facing Columns.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

object SparkShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Dataset.ofRows is private[sql]; needed to surface custom LogicalPlans
    * (e.g. graft.plans.GroupedTopK) as user-facing DataFrames. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** EAGER Column → catalyst Expression conversion. `expression` above
    * returns a lazy ColumnNodeExpression bridge that only the classic
    * Dataset API converts; inside a custom LogicalPlan the analyzer never
    * touches it, so custom plans need the real converter. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Idempotently add a planner strategy to an existing session (the
    * extensions-at-build-time path isn't available for getOrCreate'd
    * sessions; experimental.extraStrategies is the supported hook). */
  def addStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Block until every queued listener event is delivered (listenerBus is
    * private[spark]) — profiling tools read listener-collected metrics
    * right after an action, and a fixed sleep can miss late completions. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Idempotently add an optimizer rule to an existing session. */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
