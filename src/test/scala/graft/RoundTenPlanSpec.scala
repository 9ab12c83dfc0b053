package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Plan contracts for the round-9 performance-sensitive shapes
  * (round-9 verdict task 1), mirroring [[RoundNinePlanSpec]]'s
  * convention: the only regression modes left on these gates are
  * SILENT plan drift — a well-meaning refactor back to the array +
  * zip_with distance (the measured 9.2 s CodegenFallback mode of
  * the matrix profile), a per-lag self-join creeping into the ACF,
  * a join sneaking into the keyed-state streaming transforms, or an
  * exchange appearing in the LSH band build — so each shape is
  * pinned here and fails `sbt test` instead of surfacing as a bench
  * diff rounds later. */
class RoundTenPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def joinLines(plan: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("Join") && !l.contains("ReusedExchange")).toSeq

  /** Every CodegenFallback expression anywhere in the physical plan
    * (the interpreted-eval escape hatch — a HOF like zip_with or
    * aggregate lands here and costs ~5x on a hot inner loop).
    * AQE-aware: an AdaptiveSparkPlanExec hides its real plan from
    * TreeNode.collect (it has no children until execution), so a
    * naive scan is VACUOUSLY empty on any plan with an exchange —
    * recurse into the wrapped plan explicitly. Subquery-aware too
    * (the round-10 ADVICE find): a scalar/IN subquery's plan hangs
    * off the expression, not the operator tree, so each node's
    * `subqueries` are scanned recursively as well. */
  private def fallbacksOf(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => fallbacksOf(a.executedPlan)
      case n => n.expressions.flatMap(_.collect {
        case e: CodegenFallback => e.prettyName
      }).toSeq ++ n.subqueries.flatMap(fallbacksOf)
    }.flatten.distinct

  private def fallbackExprs(df: DataFrame): Seq[String] =
    fallbacksOf(df.queryExecution.executedPlan)

  test("matrix profile: the per-pair distance codegens inline — no " +
      "CodegenFallback expression anywhere in the plan (the array + " +
      "zip_with form was the measured 9.2 s mode), one bounded " +
      "broadcast nested-loop all-pairs join, no SMJ, no cartesian") {
    val df = graft.ops.TimeSeries.tsMatrixProfile(spark, sf)
    val fb = fallbackExprs(df)
    assert(fb.isEmpty, s"CodegenFallback leaked back: $fb")
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val joins = joinLines(plan)
    assert(joins.size == 1 &&
      joins.head.contains("BroadcastNestedLoopJoin"),
      s"expected the single bounded all-pairs BNLJ:\n$plan")
  }

  test("acf: ONE aggregate row fans out through explode — no per-lag " +
      "self-joins (at most the one broadcast band join), no SMJ, no " +
      "CodegenFallback in the lag arithmetic") {
    val df = graft.ops.TimeSeries.tsAcf(spark, sf)
    val fb = fallbackExprs(df)
    assert(fb.isEmpty, s"CodegenFallback leaked back: $fb")
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the lag fan-out is a Generate (explode), not 14 passes
    assert(plan.contains("Generate"), plan)
    val joins = joinLines(plan)
    assert(joins.size <= 1 && joins.forall(_.contains("Broadcast")),
      s"per-lag join leaked back:\n$plan")
  }

  test("streaming anomaly screen: TransformWithState keyed state, " +
      "zero joins in the batch-mode plan") {
    graft.streaming.EventStreams.withRocksDb(spark) {
      val ev = Tables.events(spark, sf)
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("value"))
      val plan = planOf(
        graft.ops.StreamingQueries.anomalyStateUpdates(ev).toDF())
      assert(plan.contains("TransformWithState"), plan)
      assert(joinLines(plan).isEmpty, plan)
    }
  }

  test("streaming watermark scoreboard: TransformWithState keyed " +
      "state, zero joins, and the per-doc counts stay a scan-side " +
      "projection (no Generate/explode upstream of the transform)") {
    graft.streaming.EventStreams.withRocksDb(spark) {
      val docs = Tables.documents(spark, sf)
      val plan = planOf(
        graft.ops.TextAnalysis.watermarkStateUpdates(docs).toDF())
      assert(plan.contains("TransformWithState"), plan)
      assert(joinLines(plan).isEmpty, plan)
      assert(!plan.contains("Generate"),
        s"the counts projection grew an explode:\n$plan")
    }
  }

  test("cdc chunks: the kernel keeps the whole gate out of " +
      "CodegenFallback (the interpreted HOF form was the suite's " +
      "most expensive gate) and the plan stays join-free") {
    val df = graft.ops.Dedup.cdcChunks(spark, sf)
    val fb = fallbackExprs(df)
    assert(fb.isEmpty, s"CodegenFallback leaked back: $fb")
    assert(joinLines(planOf(df)).isEmpty, planOf(df))
  }

  test("multimodal phash/resize: the CellByteStats kernel replaces " +
      "the per-char transform+explode — no CodegenFallback, no " +
      "(doc, cell) aggregation exchange upstream of the explode") {
    Seq(graft.ops.Multimodal.phash(spark, sf),
        graft.ops.Multimodal.resize(spark, sf)).foreach { df =>
      val fb = fallbackExprs(df)
      assert(fb.isEmpty, s"CodegenFallback leaked back: $fb")
      assert(joinLines(planOf(df)).isEmpty, planOf(df))
    }
    // resize needs no aggregation at all now — the kernel IS the
    // (doc, cell) aggregate; only the output sort remains wide
    val rplan = planOf(graft.ops.Multimodal.resize(spark, sf))
    assert(!rplan.contains("HashAggregate"),
      s"the per-cell aggregate crept back in:\n$rplan")
  }

  test("lsh band build: minhashBandKeys stays a pure projection — " +
      "zero exchanges, zero joins before the caller's bucket shuffle") {
    val corpus = graft.ops.DocCorpus.withDuplicates(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val df = graft.ops.Dedup.minhashBandKeys(corpus)
    val plan = planOf(df)
    assert(joinLines(plan).isEmpty, plan)
    assert(!plan.linesIterator.exists(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange")),
      s"exchange crept into the band build:\n$plan")
    // The tokenizer's once-per-row filter HOF (TextFunctions.tokens)
    // is the ONLY permitted fallback; the per-signature kernels
    // (graft_minhash_signature / graft_minhash_bands) must codegen —
    // those were the measured 2x of dedup_minhash_estimate.
    val allowed = Set("filter", "lambdafunction", "namedlambdavariable")
    val fb = fallbackExprs(df).filterNot(allowed)
    assert(fb.isEmpty,
      s"the MinhashSignature kernel fell out of codegen: $fb")
  }
}
