package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Maintenance, Similarity, TrainingData}

/** Unit fixtures for the round-5 additions: closed-form invariants
  * the sf-corpus gates can't state (perfect-reconstruction PQ,
  * integer-weight epochs, planted-duplicate detection). */
class RoundFiveOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("epochsSample: integer weight w replicates every doc exactly w times") {
    val out = TrainingData.epochsSample(spark, sf, Map("src0" -> 2.0))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Epoch 1 and epoch 2 must hold the identical doc census; no
    // epoch 3, no other sources.
    assert(out.keys.map(_._1).toSet == Set("src0"))
    assert(out.keys.map(_._2).toSet == Set(1L, 2L))
    assert(out(("src0", 1L)) == out(("src0", 2L)))
  }

  test("epochsSample: epoch k is a superset census of epoch k+1") {
    val out = TrainingData.epochs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((src, ep), n) <- out if out.contains((src, ep + 1)))
      assert(n >= out((src, ep + 1)),
        s"epoch $ep of $src smaller than epoch ${ep + 1}")
    // Fractional tail: src0 w=2.5 → epoch 3 is a strict subset.
    assert(out(("src0", 3L)) < out(("src0", 1L)))
    assert(!out.keys.exists(_._2 > 3L))
  }

  test("pqEncode: codebook of the whole corpus reconstructs exactly") {
    val out = Similarity.pqEncode(spark, sf, m = 4, k = 500).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) == 0.0,
      s"label ${r.getLong(0)} has nonzero reconstruction error"))
  }

  test("pqEncode: coarser codebook strictly increases total error") {
    def total(k: Int): Double =
      Similarity.pqEncode(spark, sf, m = 4, k = k).collect()
        .map(_.getDouble(2)).sum
    val coarse = total(4)
    val fine = total(64)
    assert(fine < coarse, s"k=64 err $fine !< k=4 err $coarse")
  }

  test("pqAdc: five ranked neighbors per query, never the query itself") {
    val out = Similarity.pqAdc(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(!rows.exists(_.getLong(1) == q), s"query $q returned itself")
    }
  }

  test("dqUniqueness: clean PK shows zero dups, planted dups surface") {
    val out = DataQuality.dqUniqueness(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (cKeys, cRows, cDups, cMax) = out("orders_clean")
    assert(cDups == 0L && cMax == 1L && cKeys == cRows)
    val (oKeys, oRows, oDups, oMax) = out("orders_corrupted")
    assert(oDups > 0L && oMax == 2L)
    assert(oRows == oKeys + oDups) // each dup key contributes one extra row
  }

  test("native asof join: closed-form fixture incl. ties and misses") {
    import spark.implicits._
    val left = Seq( // (key, t, ltag)
      (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "ltag")
    val right = Seq( // (key, t, id): key 1 has a tie at t=10; key 3 empty
      (1L, 10L, 100L), (1L, 10L, 101L), (1L, 15L, 102L),
      (2L, 6L, 200L)).toDF("rk", "rt", "rid")
    val out = graft.plans.AsofJoinNative
      .join(left, right, "k", "t", "rk", "rt", "rid")
      .select(col("ltag"), col("rid")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      "a" -> 101L, // tie at t=10 → greatest rid
      "b" -> 102L, // latest at-or-before 20
      "c" -> -1L, // right row exists but is in the future
      "d" -> -1L)) // no right rows for key 3 at all
  }

  test("native forward asof: earliest at-or-after, tolerance bounds age") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 50L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "ltag")
    val right = Seq( // key 1: tie at t=10 → smallest rid; 60 is beyond b+tol
      (1L, 10L, 101L), (1L, 10L, 100L), (1L, 60L, 102L),
      (2L, 4L, 200L)) // key 2: only a PAST row → no forward match
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsofJoinNative
      .join(left, right, "k", "t", "rk", "rt", "rid",
        direction = "forward", toleranceMicros = Some(5L))
      .select(col("ltag"), col("rid")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      "a" -> 100L, // tie at t=10 → smallest rid
      "b" -> -1L, // next right is t=60, outside tolerance 5
      "c" -> -1L)) // nothing at-or-after
  }

  test("native nearest asof: distance ties go backward") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("k", "t", "ltag")
    val right = Seq( // for t=10: back at 7 (d=3), fwd at 12 (d=2) → fwd
      (1L, 7L, 100L), (1L, 12L, 101L),
      // for t=100: back at 95 (d=5), fwd at 105 (d=5) → tie → backward
      (1L, 95L, 102L), (1L, 105L, 103L)).toDF("rk", "rt", "rid")
    val out = graft.plans.AsofJoinNative
      .join(left, right, "k", "t", "rk", "rt", "rid",
        direction = "nearest")
      .select(col("ltag"), col("rid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 101L, "b" -> 102L))
  }

  test("native asof join ≡ composed asof on the corpus") {
    val native = graft.ops.AsofJoin.purchaseAsofViewNative(spark, sf)
      .collect().map(_.toSeq).toSeq
    val composed = graft.ops.AsofJoin.purchaseAsofView(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(native == composed)
  }

  test("native asof join plans AsofJoinExec with co-partitioned sorts") {
    val plan = graft.ops.AsofJoin.purchaseAsofViewNative(spark, sf)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in rendered plans.
    assert(plan.contains("AsofJoin"), plan)
    // EnsureRequirements must have inserted the key exchanges + sorts
    // the operator declared — the merge depends on them.
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("MIPS→cosine norm augmentation preserves the exact ranking") {
    val mips = graft.ops.Similarity.topKMips(spark, sf)
      .select(col("query_id"), col("target_id"), col("rank"))
      .collect().map(_.toSeq).toSeq
    val aug = graft.ops.Similarity.topKMipsAugmented(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(mips == aug)
  }

  test("bpeLearnFrom: hand-checkable merges, greedy non-overlap") {
    import spark.implicits._
    // 'aaaa' ×3 + 'ab' ×2: round 1 pair (a,a) count = 3·3 + 0 = 9.
    // Greedy merge: aaaa → [aa, aa] (positions 1-2 and 3-4, NOT the
    // overlapping 2-3). Round 2: pairs (aa,aa)=3, (a,b)=2 → (aa,aa).
    val docs = Seq((1L, "aaaa aaaa aaaa ab ab")).toDF("doc_id", "text")
    val out = graft.ops.LanguageModel.bpeLearnFrom(docs, rounds = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 9L),
      (2L, "aa", "aa", 3L)))
  }

  test("fileStatsPrune: pruned scan is exact and skips at least one file") {
    val out = Maintenance.fileStatsPrune(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getBoolean(3), "pruned scan diverged"))
    // The 1997-06-01 cutoff must actually skip the early years.
    assert(out.exists(!_.getBoolean(2)), "no file was prunable")
    assert(out.exists(_.getBoolean(2)), "no file survived the prune")
  }
}
