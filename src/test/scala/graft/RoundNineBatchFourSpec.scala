package graft

import org.apache.spark.sql.functions._

/** Round-9 growth batch four: streaming watermark-rate scoreboard +
  * split-conformal prediction intervals. */
class RoundNineBatchFourSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("watermark counts projection is value-identical to the " +
      "explode formulation, per document") {
    val docs = Tables.documents(spark, sf)
    val proj = graft.ops.TextAnalysis.watermarkCountsProjection(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("n"),
        sum(col("g")).as("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exploded = graft.ops.TextAnalysis.watermarkDetect(spark, sf)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("d"), sum(col("n_bigrams")).as("n"),
        sum(col("n_green")).as("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(proj == exploded)
  }

  test("streaming watermark transform: TransformWithState keyed " +
      "state, zero joins; batch-mode totals equal the batch rollup") {
    graft.streaming.EventStreams.withRocksDb(spark) {
      val docs = Tables.documents(spark, sf)
      val updates = graft.ops.TextAnalysis
        .watermarkStateUpdates(docs).toDF()
      val plan = planOf(updates)
      assert(plan.contains("TransformWithState"), plan)
      assert(!plan.linesIterator.exists(_.contains("Join")), plan)
      // one "micro-batch" (all docs at once): the emitted totals ARE
      // the batch rollup
      val got = updates.collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val want = graft.ops.TextAnalysis.watermarkCountsProjection(docs)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("d"), sum(col("n")).as("n"),
          sum(col("g")).as("g"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == want)
    }
  }

  test("conformal: splits partition the table, coverage meets the " +
      "90% guarantee, half-width non-negative") {
    val r = graft.ops.Learn.conformal(spark, sf).collect().head
    val n = Tables.lineitem(spark, sf).count()
    assert(r.getLong(0) + r.getLong(1) == n, r.toString)
    assert(r.getLong(5) >= 900000L && r.getLong(5) <= 1000000L,
      r.toString)
    assert(r.getLong(4) >= 0L, r.toString)
  }

  test("conformal plan: one power-sum pass, one residual pass, " +
      "histogram-sized window; no SMJ, no cartesian") {
    val p = planOf(graft.ops.Learn.conformal(spark, sf))
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
