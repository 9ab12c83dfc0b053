package graft

/** Round-8 growth batch three: RRF hybrid fusion and Wilson win-rate
  * intervals. */
class RoundEightBatchThreeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rrf fusion: integer scores bounded by the rank-1 terms, ordered output") {
    val rows = graft.ops.Similarity.rrfFusion(spark, sf).collect()
    assert(rows.length == 10)
    val maxTerm = 1000000000L / 61 // rank-1 contribution at c=60
    rows.foreach { r =>
      val (rrf, inLex, inSem) = (r.getLong(1), r.getBoolean(2),
        r.getBoolean(3))
      assert(inLex || inSem, r.toString) // outer join never fabricates
      val cap = (if (inLex) maxTerm else 0L) + (if (inSem) maxTerm else 0L)
      assert(rrf > 0 && rrf <= cap, r.toString)
      // a single k=20 list's smallest term is 1e9/80
      val floorTerm = 1000000000L / 80
      assert(rrf >= floorTerm, r.toString)
    }
    // emitted in fused order
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // both-list members (if any) must outrank single-list tails with
    // lower combined mass — structural: any both-list row beats any
    // single-list row whose rank is no better
    val both = rows.filter(r => r.getBoolean(2) && r.getBoolean(3))
      .map(_.getLong(1))
    val single = rows.filter(r => r.getBoolean(2) ^ r.getBoolean(3))
      .map(_.getLong(1))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.max >= single.min)
  }

  test("streaming minhash pair miner converges to the batch operator, " +
      "each pair exactly once") {
    val streamed = graft.ops.Dedup.streamMinhashLsh(spark, sf).collect()
    val batch = graft.ops.Dedup.minhashLsh(spark, sf).collect()
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)),
      s"stream=${streamed.length} batch=${batch.length}")
    // exactly-once: no pair appears twice in the accumulated state
    val keys = streamed.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("wilson ci: interval brackets the point estimate, decided is the definition") {
    val rows = graft.ops.Evaluation.wilsonWinCi(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val (n, wa, pPpm, lo, hi, decided) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))
      assert(wa >= 0 && wa <= n, r.toString)
      assert(lo >= 0 && hi <= 1000000L && lo <= hi, r.toString)
      // Wilson interval always contains the point estimate
      assert(lo <= pPpm + 1 && hi + 1 >= pPpm, r.toString)
      assert(decided == (lo > 500000L || hi < 500000L), r.toString)
    }
  }
}
