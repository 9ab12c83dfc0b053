package graft

import org.apache.spark.sql.functions._

/** Round-8 growth batch two: prefix-share audit, preference-cycle
  * census, kNN label-noise screen. */
class RoundEightBatchTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prefix share: identities hold at every L; no join in the plan") {
    val rows = graft.ops.TrainingData.prefixShare(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sameElements(Array(4L, 8L, 16L)))
    rows.foreach { r =>
      val (l, nSeqs, nDistinct, dup, saved) = (r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nDistinct + dup == nSeqs, r.toString) // every seq is first-of-prefix or a dup
      assert(saved == dup * l, r.toString)         // savings definition
      assert(nSeqs > 0 && nDistinct > 0, r.toString)
    }
    val plan = graft.ops.TrainingData.prefixShare(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("preference cycles: Moon identity equals the brute-force triad census") {
    val row = graft.ops.Evaluation.prefCycles(spark, sf).head()
    val n = 60
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == n.toLong * (n - 1) / 2)     // complete tournament
    assert(row.getLong(2) == n.toLong * (n - 1) * (n - 2) / 6)
    // independent brute-force census of the same deterministic
    // tournament (the hash convention is integer arithmetic, so this
    // replays it exactly)
    def beats(a: Int, b: Int): Boolean = {
      require(a < b)
      (a.toLong * 2654435761L + b.toLong * 40503L) % 97 < 49
    }
    def w(a: Int, b: Int): Boolean = // true iff a beats b, any order
      if (a < b) beats(a, b) else !beats(b, a)
    var cyclic = 0L
    for (i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n) {
      val (ij, jk, ki) = (w(i, j), w(j, k), w(k, i))
      if ((ij && jk && ki) || (!ij && !jk && !ki)) cyclic += 1
    }
    assert(row.getLong(3) == cyclic,
      s"gate says ${row.getLong(3)}, census says $cyclic")
    assert(row.getLong(4) == cyclic * 1000000L / row.getLong(2))
  }

  test("label noise: agreement bounded by k, suspect flag is the definition") {
    val rows = graft.ops.Similarity.labelNoiseKnn(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val (agree, suspect) = (r.getLong(2), r.getBoolean(3))
      assert(agree >= 0 && agree <= 5, r.toString)
      assert(suspect == (agree * 2 < 5), r.toString)
    }
    // weak-cluster corpus (within-label cosine ≈ 0.01): neighbor labels
    // are near-uniform over 10 classes, so most rows must be flagged
    assert(rows.count(_.getBoolean(3)) > 50)
  }
}
