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

  test("behavior LSH top-k: corpus is never broadcast, no all-pairs join") {
    import org.apache.spark.sql.functions.col
    // threshold -1 disables every SIZE-chosen broadcast, so any
    // BroadcastExchange left in the plan would be a FORCED one — the
    // full-corpus broadcast this scale path exists to eliminate
    // (the round-3 ts_behavior_topk baseline's cross join).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = graft.ops.TimeSeries.behaviorCorpus(spark, sf)
        .withColumn("is_query", col("user_id") < 50)
      val plan = planOf(graft.ops.TimeSeries.behaviorTopKLshOver(corpus))
      assert(!plan.contains("BroadcastExchange"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dbscan LSH scale path: no all-pairs stage, labels equal the exact baseline") {
    // Plan contract: the exact baseline's pair stage IS a broadcast
    // nested loop (bounded oracle by design); the LSH path must have
    // replaced it with an equi hash join on (table, bucket) — any
    // nested loop or cartesian in this plan is the scale-killer the
    // path exists to eliminate. (The explicit broadcast() hints on
    // metadata-sized label frames downstream are BroadcastHashJoins
    // and are fine.)
    val lsh = graft.ops.Similarity.dbscanLsh(spark, sf)
    val plan = planOf(lsh)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // Label equality with the exact baseline at fixture scale: the
    // sf0.01 oracle gate asserts this against DuckDB; this spec pins
    // it in-engine so a parameter regression fails fast.
    val exact = graft.ops.Similarity.dbscan(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val approx = lsh
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(exact.sameElements(approx),
      s"labels diverge: ${exact.diff(approx).take(5).mkString(",")}")
  }

  test("pagerank shuffle mode: rank joins shuffle, never broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L))
      .toDF("src", "dst", "w").repartition(col("src"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val nodes = Seq("a", "b", "c").toDF("node")
    val ranks = nodes.withColumn("r", lit(100L))
    val plan = planOf(graft.ops.Graph.rankStep(
      edges, outw, nodes, ranks, 3L, broadcastRanks = false))
    // the contract of the knob: per-round joins move only the rank
    // vector to the edges' standing partitioning — tiny-side size
    // must NOT flip them to broadcast (that is the other mode)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)
  }

  test("ewma: one hash exchange feeds the window; no join anywhere") {
    val df = graft.ops.TimeSeries.ewma(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Join"), plan)
    // one user_id hash exchange for the window; the only other
    // exchange is the gate's output range-sort
    val hashExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, plan)
  }

  test("resample: the grid frame is never exchanged (shared hash(user) clustering)") {
    val plan = planOf(graft.ops.TimeSeries.tsResample(spark, sf))
    // Contract of the shared-exchange design: the 720×users spine is
    // born inside the hourly aggregate's hash(user_id) re-clustering,
    // the spine↔hourly SMJ reuses it on BOTH sides (subset-key
    // co-partitioning), and the fill window + per-user rollup ride
    // the same clustering. The ONLY hash exchanges in the whole plan
    // are therefore the hourly aggregate's and the explicit
    // re-clustering — anything more means the grid frame leaked into
    // a shuffle.
    assert(plan.contains("SortMergeJoin"), plan)
    // Everything ABOVE the join (fill window, per-user rollup) rides
    // the join's hash(user_id) clustering: the only exchange allowed
    // there is the gate's final range sort. (The small hourly sides
    // BELOW the join may re-cluster — that frame is users×hours,
    // metadata next to the grid.)
    val lines = plan.linesIterator.toSeq
    val joinAt = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(joinAt > 0, plan)
    assert(!lines.take(joinAt).exists(_.contains("Exchange hashpartitioning")),
      lines.take(joinAt).mkString("\n"))
    assert(!plan.contains("BroadcastExchange"), plan)
  }

  test("behavior LSH: candidate scoring keeps fixed-width parallelism") {
    val corpus = graft.ops.TimeSeries.behaviorCorpus(spark, sf)
      .withColumn("is_query", org.apache.spark.sql.functions.col("user_id") < 50)
    val plan = planOf(graft.ops.TimeSeries.behaviorTopKLshOver(corpus))
    // The id-pair repartition before the levenshtein phase must be a
    // FIXED-width REPARTITION_BY_COL (AQE would otherwise coalesce the
    // tiny shuffle to one partition and serialize the scoring).
    assert(plan.contains("REPARTITION_BY_NUM") ||
      plan.contains("REPARTITION_BY_COL"), plan)
  }

  test("eval_ndcg: histogram sides broadcast, no sort-merge join") {
    val plan = planOf(graft.ops.Evaluation.ndcgGate(spark, sf))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q45 skyline: frontier joins back by broadcast, no dominance " +
      "self-join") {
    val plan = planOf(Relational.q45Skyline(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the O(n²) NOT-EXISTS formulation would plan a nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ivm join: both delta terms broadcast the changed batch") {
    val plan = planOf(graft.ops.Maintenance.ivmJoin(spark, sf))
    val n = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(n >= 2, plan) // delta-orders term + delta-customer term
  }

  test("fellegi-sunter: candidates come from equi joins, no cross join") {
    val plan = planOf(graft.ops.Linkage.fellegiSunter(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
