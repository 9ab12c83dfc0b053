package graft

/** Plan contracts for the round-8 gates (round-8 verdict task 4) plus
  * the round-9 keyed-store streaming shape, mirroring
  * [[RoundSevenPlanSpec]]'s convention: shapes asserted on the
  * rendered physical plan so a regression (a leaked join, a lost
  * broadcast, the O(n³) triple join prefCycles replaced) fails in
  * `sbt test` instead of surfacing as a bench diff. */
class RoundNinePlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def joinLines(plan: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("Join") && !l.contains("ReusedExchange")).toSeq

  test("rrf fusion: the fusion is union+groupBy — no join of the two " +
      "top-k lists, no SMJ, no shuffled-hash join") {
    // The retrievers legitimately broadcast-cross tiny frames (the
    // query vector, corpus stats); the FUSION must not add a join —
    // a full-outer of the two lists plans an SMJ.
    val plan = planOf(graft.ops.Similarity.rrfFusion(spark, sf))
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("FullOuter"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // every remaining join is a broadcast cross from a retriever
    assert(joinLines(plan).forall(_.contains("Broadcast")), plan)
  }

  test("semdedup: ONE shuffled-hash cell join carries the theta-pair " +
      "work; assignment is broadcast; no SMJ") {
    val plan = planOf(graft.ops.Similarity.semDedupCluster(spark, sf))
    val shj = plan.linesIterator.count(_.contains("ShuffledHashJoin"))
    assert(shj == 1, s"expected exactly the within-cell pair join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // seed pick / argmax assignment / keep-min-id ride on broadcasts
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("survivorship: exactly two left-outer shuffled-hash partner " +
      "joins; no SMJ anywhere") {
    val plan = planOf(graft.ops.Dedup.survivorship(spark, sf))
    val partnerJoins = plan.linesIterator.count(l =>
      l.contains("ShuffledHashJoin") && l.contains("LeftOuter"))
    assert(partnerJoins == 2, s"expected the two partner joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("pref cycles: Moon's identity keeps it to the single bounded " +
      "duel-pair broadcast cross — the O(n^3) triple join must never " +
      "reappear") {
    val plan = planOf(graft.ops.Evaluation.prefCycles(spark, sf))
    assert(joinLines(plan).size <= 1, s"triple join leaked back:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("streaming dup-rate transform: TransformWithState keyed state, " +
      "zero joins") {
    // Batch-mode execution of the same transform (one micro-batch,
    // transient store) exposes the plan shape the stream runs.
    graft.streaming.EventStreams.withRocksDb(spark) {
      val docs = Tables.documents(spark, sf)
      val plan = planOf(graft.ops.Dedup.dupRateStateUpdates(docs).toDF())
      assert(plan.contains("TransformWithState"), plan)
      assert(joinLines(plan).isEmpty, plan)
    }
  }

  test("streaming minhash miner: TransformWithState keyed state, zero " +
      "joins; batch-mode run reproduces the batch pair set exactly") {
    graft.streaming.EventStreams.withRocksDb(spark) {
      val corpus = graft.ops.DocCorpus.withDuplicates(spark, sf)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val mined = graft.ops.Dedup.minhashStateMiner(corpus).toDF()
      val plan = planOf(mined)
      assert(plan.contains("TransformWithState"), plan)
      assert(joinLines(plan).isEmpty, plan)
      // batch = everything in one "micro-batch": within-batch pairing
      // alone must equal minhashLshPairs after the bucket-multiplicity
      // distinct the reader applies
      val got = mined.distinct()
        .orderBy("id_a", "id_b").collect().map(_.toString)
      val want = graft.ops.Dedup.minhashLshPairs(corpus)
        .collect().map(_.toString)
      assert(got.sameElements(want),
        s"mined=${got.length} batch=${want.length}")
    }
  }
}
