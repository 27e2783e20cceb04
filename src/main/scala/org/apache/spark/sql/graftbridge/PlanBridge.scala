package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions

/** LogicalPlan ⇄ DataFrame bridge for graft's custom plan nodes —
  * same rationale as ColumnBridge: `Dataset.ofRows` and
  * `Dataset.logicalPlan` are `private[sql]` in Spark 4, and a library
  * shipping a custom LogicalPlan/Strategy needs exactly these two
  * hooks to expose it behind a DataFrame API. */
object PlanBridge {
  def logicalPlan(df: DataFrame): LogicalPlan =
    ClassicConversions.castToImpl(df).logicalPlan

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(spark), plan)
}
