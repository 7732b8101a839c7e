// The one file in this codebase that lives inside Spark's package
// namespace: `Dataset.ofRows` (LogicalPlan → DataFrame) is
// `private[sql]`, and a custom whole-operator plan
// (graft.plans.AsofJoinPlan) needs it to hand its logical node to the
// session. A single forwarding def keeps the package-private surface
// area to exactly one call — the standard pattern for Spark-native
// libraries shipping their own operators.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
