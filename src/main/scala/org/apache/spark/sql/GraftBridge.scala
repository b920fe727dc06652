package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Two-line bridge into the `private[sql]` seams a whole-operator
  * extension needs: constructing a DataFrame from a custom LogicalPlan
  * (`Dataset.ofRows`) and a Column from a resolved Attribute
  * (`ExpressionUtils.column`). The standard OSS-extension technique
  * (Delta Lake, GraphFrames, Iceberg all ship the same shim) — kept to
  * exactly these two forwarders so the engine's dependence on
  * non-public surface is auditable in one file.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
