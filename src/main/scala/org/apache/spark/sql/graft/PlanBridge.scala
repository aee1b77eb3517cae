package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` seam this library needs: turning a custom
  * [[LogicalPlan]] (graft.plans.AsofJoin) into a DataFrame. Spark
  * exposes every other extension point publicly (expressions and
  * aggregates via the function registry, optimizer rules and planner
  * strategies via SparkSessionExtensions / experimental), but plan
  * CONSTRUCTION has no public API — so, like the major Spark extension
  * libraries (Delta, Iceberg, Sedona), we place this single accessor
  * inside an `org.apache.spark.sql` subpackage. Nothing else in the
  * repo lives outside the `graft` namespace.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
