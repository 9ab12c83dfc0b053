package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Graph, Maintenance, Similarity, TrainingData}

/** Semantic invariants for the round-3 operator batch — properties
  * the DuckDB value gates can't state (determinism across runs,
  * disjointness, conservation bounds). */
class RoundThreeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("negative sampling: disjoint from positives, exactly kNeg, stable") {
    val negs = Similarity.negativeSample(spark, sf).collect()
    val pos = Similarity.topK(spark, sf)
      .select("query_id", "target_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negs.forall(r => !pos.contains((r.getLong(0), r.getLong(1)))))
    assert(negs.groupBy(_.getLong(0)).values.forall(_.length == 8))
    assert(negs.forall(r => r.getLong(0) != r.getLong(1)))
    val again = Similarity.negativeSample(spark, sf).collect()
    assert(negs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("transition matrix rows are (sub-)stochastic within floor loss") {
    val t = Graph.transitions(spark, sf).collect()
      .groupBy(_.getString(0))
    t.values.foreach { rows =>
      val total = rows.map(_.getLong(3)).sum
      // each of the |dst| floors loses < 1 ppm-unit
      assert(total <= 1000000L && total > 1000000L - rows.length)
    }
  }

  test("quantile bins: partition the table, ordered ranges") {
    val bins = DataQuality.quantileBins(spark, sf).collect()
    assert(bins.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val total = Tables.lineitem(spark, sf).count()
    assert(bins.map(_.getLong(1)).sum == total)
    // range boundaries are non-overlapping and ordered
    val his = bins.map(_.getDouble(3))
    val los = bins.map(_.getDouble(2))
    assert(los.zip(his).forall { case (lo, hi) => lo <= hi })
    assert(his.init.zip(los.tail).forall { case (hi, lo) => hi <= lo })
  }

  test("MAD screen: bounded outliers, nonnegative spread") {
    val out = DataQuality.dqMad(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // outliers <= n
      assert(r.getDouble(4) >= 0.0)        // mad6 >= 0
    }
  }

  test("scd2 snapshot: at most one version per key") {
    val snap = Maintenance.scd2Snapshot(spark, sf)
    val dupKeys = snap.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(dupKeys == 0)
    assert(snap.count() > 0)
  }

  test("train/val/test split: exhaustive, disjoint by construction, ~80/10/10") {
    val byBucket = TrainingData.trainValTestSplit(spark, sf).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = byBucket.values.sum
    assert(total == Tables.documents(spark, sf).count())
    assert(byBucket.keySet == Set("train", "val", "test"))
    // multiplicative-hash buckets are near-uniform: train within 70-90%
    val frac = byBucket("train").toDouble / total
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac")
  }

  test("time-travel generations: previous is the full pre-purge table") {
    val gens = graft.ops.ParityQueries.purgeTimeTravel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gens("previous") == Tables.orders(spark, sf).count())
    assert(gens("current") < gens("previous"))
  }
}
