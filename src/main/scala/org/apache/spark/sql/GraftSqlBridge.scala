package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: turn a constructed [[LogicalPlan]]
  * into a DataFrame via `classic.Dataset.ofRows`, which runs the full
  * analyzer/optimizer/planner pipeline over it. The standard pattern
  * for libraries that contribute custom logical operators (the same
  * door Delta/Iceberg-style extensions use); the ONLY non-public API
  * the repo touches, isolated to this one call. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
