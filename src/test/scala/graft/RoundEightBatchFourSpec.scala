package graft

/** Round-8 growth batch four: survivorship report and distinct-n
  * diversity. */
class RoundEightBatchFourSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("survivorship: ws/case twins are exact-claimed, partners precede, " +
      "kept rows carry -1") {
    val rows = graft.ops.Dedup.survivorship(spark, sf).collect()
    assert(rows.length == 700) // 500 docs + 100 ws/case + 100 drop-last
    val byId = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2))).toMap
    // every +10000 twin normalizes to its original's text → exact,
    // with a partner no later than the original
    (0L until 100L).foreach { i =>
      val (v, p) = byId(i + 10000L)
      assert(v == "exact", s"${i + 10000} -> $v")
      assert(p <= i, s"${i + 10000} partner $p")
    }
    rows.foreach { r =>
      val (id, v, p) = (r.getLong(0), r.getString(1), r.getLong(2))
      if (v == "kept") assert(p == -1L, r.toString)
      else assert(p >= 0 && p < id, r.toString) // keeper precedes
    }
    // drop-last twins are claimed by SOME stage (near for long docs,
    // exact only if truncation collides) — none may survive as kept
    // unless its Jaccard fell below 0.6 (very short docs); count that
    // tail stays small
    val keptTruncated = (0L until 100L)
      .count(i => byId(i + 20000L)._1 == "kept")
    assert(keptTruncated < 20, s"$keptTruncated truncated twins kept")
  }

  test("harmonic centrality: bounded by closeness's reach, exact terms") {
    val h = graft.ops.Graph.harmonic(spark, sf).collect()
    val c = graft.ops.Graph.closeness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h.nonEmpty)
    h.foreach { r =>
      val (node, nReach, he6) = (r.getString(0), r.getLong(1),
        r.getLong(2))
      assert(c(node)._1 == nReach, r.toString) // same BFS, same reach
      // each of n terms is 10⁶ div d ∈ [10⁶ div maxd, 10⁶]
      assert(he6 <= nReach * 1000000L, r.toString)
      assert(he6 >= nReach * (1000000L / math.max(1L, c(node)._2)),
        r.toString)
    }
  }

  test("distinct-n: identities and the vocabulary-driven n-gram growth") {
    val rows = graft.ops.TextAnalysis.distinctN(spark, sf).collect()
    assert(rows.length % 3 == 0 && rows.nonEmpty)
    rows.foreach { r =>
      val (total, dist, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dist >= 1 && dist <= total, r.toString)
      assert(ppm == dist * 1000000L / total, r.toString)
    }
    // 31-word vocabulary: unigram diversity is tiny, trigram much
    // larger — distinct-ppm strictly increases with n per source
    rows.grouped(3).foreach { g =>
      assert(g(0).getLong(4) < g(1).getLong(4), g.mkString(";"))
      assert(g(1).getLong(4) < g(2).getLong(4), g.mkString(";"))
    }
  }
}
