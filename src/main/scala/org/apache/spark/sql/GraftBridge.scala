package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the `private[sql]` plan→DataFrame constructor, the
  * standard escape hatch a library needs to hand a custom LogicalPlan
  * (graft.plans.AsofJoin) back to the public Dataset API. Nothing else from
  * the internal surface is exposed. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
