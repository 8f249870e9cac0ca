package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface needed to hang a custom
  * logical operator off a DataFrame — the standard pattern for
  * third-party Catalyst extensions (the public API deliberately has no
  * "wrap this LogicalPlan" entry point).
  */
object GraftBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      classic.ClassicConversions.castToImpl(spark), plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    classic.ClassicConversions.castToImpl(df).queryExecution.analyzed

  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = classic.ClassicConversions.castToImpl(spark).experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  def addOptimization(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = classic.ClassicConversions.castToImpl(spark).experimental
    if (!exp.extraOptimizations.contains(r)) {
      exp.extraOptimizations = exp.extraOptimizations :+ r
    }
  }
}
