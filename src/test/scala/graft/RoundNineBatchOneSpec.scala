package graft

import org.apache.spark.sql.functions._

/** Round-9 growth batch one: streaming SemDeDup and the frozen-weights
  * hashed-feature quality scorer. */
class RoundNineBatchOneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming semdedup converges to the batch verdicts across the " +
      "three-batch replay") {
    val streamed = graft.ops.Similarity.streamSemDedup(spark, sf)
      .collect()
    val batch = graft.ops.Similarity.semDedupCluster(spark, sf)
      .collect()
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)),
      s"stream=${streamed.length} batch=${batch.length}")
    // at least one planted twin must actually be dropped, or the gate
    // proves nothing
    assert(streamed.exists(r => !r.getBoolean(2)), "no drops at all")
  }

  test("semdedup state transform: assignment is a projection (zero " +
      "joins), state is TransformWithState") {
    graft.streaming.EventStreams.withRocksDb(spark) {
      val base = graft.ops.Similarity.withNearDuplicates(spark, sf)
        .withColumn("n",
          sqrt(graft.plans.VectorExpressions.vectorDot(col("v"), col("v"))))
      val seeds = base
        .withColumn("h",
          pmod(col("vec_id") * lit(2654435761L), lit(999983L)))
        .orderBy(col("h"), col("vec_id")).limit(8)
        .select(col("v"), col("n")).collect()
        .map(r => (r.getSeq[Double](0), r.getDouble(1)))
      val events = graft.ops.Similarity
        .semDedupStateEvents(base, seeds, 0.99).toDF()
      val plan = events.queryExecution.executedPlan.toString
      assert(plan.contains("TransformWithState"), plan)
      assert(!plan.linesIterator.exists(l =>
        l.contains("Join") && !l.contains("ReusedExchange")), plan)
      // batch-mode fold of the events = the batch gate's verdicts
      val got = events.groupBy(col("vec_id"))
        .agg(min(col("cell")).as("cell"), max(col("dropped")).as("dr"))
        .select(col("vec_id"), col("cell"), (!col("dr")).as("kept"))
        .orderBy(col("vec_id")).collect().map(_.toString)
      val want = graft.ops.Similarity.semDedupCluster(spark, sf)
        .collect().map(_.toString)
      assert(got.sameElements(want), s"got=${got.length} want=${want.length}")
    }
  }

  test("quality score: separates the training label, verdict is the " +
      "margin sign, token-free docs default to drop") {
    val rows = graft.ops.Learn.qualityScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, score, keep) =
        (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(keep == (score > 0), r.toString)
      if (nTok == 0) assert(score == 0 && !keep, r.toString)
    }
    // the scorer was trained on lang='en'; its mean margin must
    // separate the classes on its own training corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), (col("lang") === "en").as("en"))
    val scored = graft.ops.Learn.qualityScore(spark, sf)
      .join(docs, "doc_id")
    val Array(enMean, otherMean) = scored.groupBy(col("en"))
      .agg(avg(col("score_e12")).as("m"))
      .orderBy(col("en").desc).collect().map(_.getDouble(1))
    assert(enMean > otherMean,
      s"no separation: en=$enMean other=$otherMean")
  }

  test("quality score plan: 64-row model is broadcast into the scoring " +
      "join, the all-docs verdict join is shuffled-hash; no SMJ, no " +
      "cartesian") {
    val plan = graft.ops.Learn.qualityScore(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
