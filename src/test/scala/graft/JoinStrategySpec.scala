package graft

import graft.ops.{Relational, TrainingData}

/** Join-strategy contracts: the physical join each plan is DESIGNED
  * around, asserted on the rendered plan (AQE-safe, as in
  * [[PushdownSpec]]). These are the choices the 100 TB notes promise
  * — a silent fallback to a nested loop or an unplanned shuffle is a
  * regression even while answers stay correct. */
class JoinStrategySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q3: the filtered customer dim joins by broadcast") {
    val plan = planOf(Relational.q3TopRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q34 binned range join: equi hash join, never a nested loop") {
    val plan = planOf(Relational.q34RangeJoinBinned(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan)
  }

  test("decontamination: benchmark grams broadcast, corpus side unshuffled") {
    val plan = planOf(TrainingData.decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly ONE gram-keyed exchange: the benchmark-side distinct
    // (MB-scale). A second would mean the CORPUS explode shuffled on
    // gram before the join — the scale-killer the broadcast exists to
    // avoid.
    val gramExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(gram"))
    assert(gramExchanges == 1, plan)
  }

  test("semantic dedup summary: star-contraction joins stay key-only") {
    val plan = planOf(graft.ops.Similarity.semanticDedup(spark, sf))
    // no nested-loop anywhere in the component/summary stages
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
