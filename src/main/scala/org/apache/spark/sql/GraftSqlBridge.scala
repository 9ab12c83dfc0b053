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

  /** Force-create the lazy StateStoreCoordinator driver endpoint.
    * Streaming queries create it on start; BATCH execution of
    * `transformWithState` (Spark 4 runs arbitrary state in batch as
    * one implicit micro-batch over a transient store) only LOOKS IT
    * UP, so on a session that never started a stream it dies with
    * RpcEndpointNotFound. Touching the manager's lazy val makes
    * batch-mode stateful transforms self-contained. */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit = {
    spark.asInstanceOf[classic.SparkSession]
      .streams.stateStoreCoordinator
    ()
  }
}
