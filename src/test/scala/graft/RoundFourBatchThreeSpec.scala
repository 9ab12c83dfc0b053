package graft

import org.apache.spark.sql.functions._

import graft.ops.{Evaluation, Maintenance, Skew}

/** Unit fixtures for the third round-4 operator batch (retrieval
  * eval, incremental aggregate maintenance, skew diagnostics). */
class RoundFourBatchThreeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ndcgGate: metric ranges, reciprocal-rank structure, positive rel base") {
    val rows = Evaluation.ndcgGate(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (ndcg, mrr, recall, nRel) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(ndcg > 0.0 && ndcg <= 1.0, s"ndcg out of range: $ndcg")
      assert(nRel > 0)
      assert(recall >= 0.0 && recall <= 1.0)
      // MRR is 0 or exactly 1/r for an integer rank r in 1..10.
      if (mrr != 0.0) {
        val rank = math.round(1.0 / mrr)
        assert(rank >= 1 && rank <= 10 && mrr == 1.0 / rank,
          s"mrr not reciprocal of a top-10 rank: $mrr")
      }
    }
  }

  test("incrementalAgg merge equals full recompute") {
    val merged = Maintenance.incrementalAgg(spark, sf).collect()
    val full = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        min(col("n_chars")).as("c_min"), max(col("n_chars")).as("c_max"))
      .orderBy(col("source"), col("lang"))
      .collect()
    assert(merged.toSeq == full.toSeq)
  }

  test("skewDiagnose: hottest key, integer shares, salt factor bounds") {
    val got = Skew.skewDiagnose(spark, sf).collect()
    assert(got.length == 5)
    val counts = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    // Output is the true top-5 by count (ties by user_id asc).
    val expectTop = counts.toSeq.sortBy { case (u, c) => (-c, u) }.take(5)
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toSeq == expectTop)
    got.foreach { r =>
      val (c, ppm, salt) = (r.getLong(1), r.getLong(4), r.getLong(5))
      assert(r.getLong(2) == nKeys && r.getLong(3) == total)
      assert(ppm == c * 1000000L / total)
      assert(salt == (c * nKeys + total - 1) / total && salt >= 1)
    }
  }
}
