package graft

/** Plan contracts for the hottest round-7 gates (round-8 verdict
  * task 5): the physical shapes these operators are DESIGNED around,
  * asserted on the rendered plan as in [[JoinStrategySpec]], so a
  * plan regression (a leaked join, an extra corpus-keyed shuffle)
  * fails in `sbt test` instead of surfacing as a bench diff.
  *
  * Exchange counting convention: "Exchange hashpartitioning" lines
  * are data shuffles; the single "Exchange rangepartitioning" every
  * gate ends with is the driver-mandated output ORDER BY and is not
  * counted against the shuffle budget.
  */
class RoundSevenPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(plan: String): Int =
    plan.linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("cdc chunks: shuffle-free projection — no join, no hash exchange") {
    // One linear split per doc, array slices for the 8-byte rolls,
    // then only the output range sort.
    val plan = planOf(graft.ops.Dedup.cdcChunks(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(hashExchanges(plan) == 0, plan)
  }

  test("phash: one-pass code array, grid groupBy only — no join") {
    // posexplode of the code array into (doc, cell) aggregates:
    // map-combinable hash shuffles only, never a join.
    val plan = planOf(graft.ops.Multimodal.phash(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(hashExchanges(plan) <= 2, plan)
  }

  test("resize: one-pass code array, cell groupBy only — no join") {
    val plan = planOf(graft.ops.Multimodal.resize(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(hashExchanges(plan) <= 1, plan)
  }

  test("chat template: shuffle-free projection over the packer's spans") {
    val plan = planOf(graft.ops.TrainingData.chatTemplate(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(hashExchanges(plan) <= 1, plan)
  }

  test("dup-rate scoreboard: one (source, fingerprint) distinct-reduce — no join") {
    val plan = planOf(graft.ops.Dedup.dupRateBySource(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(hashExchanges(plan) <= 2, plan)
  }

  test("adamic-adar: the wedge⋈edges SMJ is intentional; no cartesian") {
    // The 18th documented PlanAudit advisory (COVERAGE.md header):
    // link-prediction is all-pairs-over-wedges BY PREMISE. Pin the
    // SMJ so an accidental flip to nested-loop (or a silent loss of
    // the merge shape) is a test failure, not a bench surprise.
    val plan = planOf(graft.ops.Graph.adamicAdar(spark, sf))
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dbscan LSH pair stage: ONE (table, bucket) hash join, vectors carried, " +
      "no candidate re-join") {
    // The round-8 restructure this spec pins: the exact-cosine verify
    // sits ON the (table, bucket) equi-join output (vectors carried
    // through the bucket shuffle), not behind vec_id joins re-fetching
    // embeddings for the ~n² candidate set. The eager checkpoint in
    // dbscanLsh truncates this stage out of the returned plan, so the
    // contract is asserted on the exposed pair stage.
    val plan = planOf(graft.ops.Similarity.dbscanLshPairs(spark, sf))
    val joins = plan.linesIterator.count(l =>
      l.contains("Join") && !l.contains("ReusedExchange"))
    assert(joins == 1, s"expected exactly the bucket join:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
