package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Round-12 plan contracts: pin the PlanAudit blind spot (round-11
  * verdict task 5). `localCheckpoint` truncates a gate's executedPlan
  * at the materialized RDD, so interpreted expressions inside
  * CONSTRUCTION jobs are invisible to `PlanAudit --write/--strict`
  * (documented in that tool's Scaladoc). This spec recomputes the
  * HNSW gates' pre-checkpoint frames directly and asserts their
  * fallback set EXACTLY — the construction-job expressions are pinned
  * here, by spec, never hand-added to tools/fallback_inventory.tsv
  * (which must stay reproducible by --write alone). */
class RoundTwelvePlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fallbacksOf(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => fallbacksOf(a.executedPlan)
      case n => n.expressions.flatMap(_.collect {
        case e: CodegenFallback => e.prettyName
      }).toSeq ++ n.subqueries.flatMap(fallbacksOf)
    }.flatten.distinct

  private def fallbackExprs(df: DataFrame): Set[String] =
    fallbacksOf(df.queryExecution.executedPlan).toSet

  test("hnsw pre-checkpoint construction frames: fallback classes " +
      "pinned exactly (the inventory cannot see past localCheckpoint)") {
    val s = spark
    // node frame: the near-duplicate perturbation is a once-per-row
    // array transform (tolerated HOF class)
    val nodes = graft.ops.Similarity.hnswNodes(s, sf)
    val nodeFb = fallbackExprs(nodes)
    assert(nodeFb == Set("transform", "lambdafunction",
      "namedlambdavariable"),
      s"hnsw node-frame fallback drift: $nodeFb")
    // graph build: the k-bounded TopK buffer is an object-based
    // aggregate (non-codegen by design in Spark) — the one
    // construction-job expression class PlanAudit measured as
    // invisible in round 11; everything else must stay compiled
    val edges = graft.ops.Similarity.bucketedKnnEdges(
      nodes.localCheckpoint(), k = 12, nTables = 8, bits = 5, par = 4)
    val edgeFb = fallbackExprs(edges)
    assert(edgeFb == Set("topk"),
      s"hnsw bucketed-build fallback drift: $edgeFb — kernel-ize the " +
        "regression or update this pin with rationale")
  }
}
