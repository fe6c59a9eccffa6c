package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into Spark's private[sql] surface: lifting a custom
  * LogicalPlan into a DataFrame (`Dataset.ofRows`) has no public
  * equivalent, and third-party engines conventionally provide it from a
  * shim in the spark.sql package (the same trick every Spark extension
  * library uses). Kept to exactly this one function.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataFrame].queryExecution.analyzed

  /** Column ⇄ Expression, for expressions that carry driver-built objects
    * (e.g. a Bloom filter) and therefore can't round-trip through the
    * function registry's name-based builders.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
