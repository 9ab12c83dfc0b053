package graft

import org.apache.spark.sql.functions._

/** Round-9 growth batch three: Elo leaderboard fold, judge
  * length-bias audit, DoReMi reweighting step, RHO-loss selection,
  * all-but-the-top embedding diagnostic, LLM-watermark detection. */
class RoundNineBatchThreeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("elo: ratings conserve the 1000-start sum (zero-sum updates), " +
      "every item duels, fold is deterministic") {
    val rows = graft.ops.Evaluation.eloRatings(spark, sf).collect()
    assert(rows.nonEmpty)
    // each update moves ±delta (6dp-snapped), so the drift is at most
    // duels × snap-residue — bounded far below one rating point
    val drift = rows.map(_.getLong(2) - 1000000000L).sum
    val duels = rows.map(_.getLong(1)).sum / 2
    assert(math.abs(drift) <= duels, s"drift=$drift duels=$duels")
    rows.foreach(r => assert(r.getLong(1) > 0L, r.toString))
    val again = graft.ops.Evaluation.eloRatings(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("length bias: bucket rows partition the ALL row, wins bounded, " +
      "ppm consistent") {
    val rows = graft.ops.Evaluation.lengthBias(spark, sf).collect()
    val all = rows.find(_.getString(0) == "ALL").get
    val buckets = rows.filter(_.getString(0) != "ALL")
    assert(buckets.map(_.getLong(1)).sum == all.getLong(1))
    assert(buckets.map(_.getLong(2)).sum == all.getLong(2))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1),
        r.toString)
    }
  }

  test("doremi step: weights normalize to ~1e6, min-excess domain is " +
      "exactly zero, weight order follows excess order") {
    val rows = graft.ops.CurationPipeline.doremiStep(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getLong(5)).sum
    assert(math.abs(wsum - 1000000L) <= rows.length, wsum.toString)
    assert(rows.map(_.getLong(4)).min == 0L)
    // multiplicative weights are monotone in excess
    rows.sortBy(_.getLong(4)).map(_.getLong(5)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"$a $b")
      case _ =>
    }
  }

  test("rho loss: only the current split is scored, selection is a " +
      "strict upper set of at most a quarter") {
    val rows = graft.ops.CurationPipeline.rhoLoss(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) % 2 == 0, r.toString))
    val sel = rows.filter(_.getBoolean(5)).map(_.getLong(4))
    val unsel = rows.filter(!_.getBoolean(5)).map(_.getLong(4))
    assert(sel.length * 4 <= rows.length, s"${sel.length}/${rows.length}")
    if (sel.nonEmpty && unsel.nonEmpty)
      assert(sel.min > unsel.max, s"${sel.min} !> ${unsel.max}")
  }

  test("abtt: centered projections sum to exactly zero, shares are " +
      "valid ppm, every vector reported") {
    val rows = graft.ops.Spectral.abtt(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n)
    // Σ_v c_v = n·S − n·S = 0 exactly, so Σ_v ⟨c_v, x⟩ = 0 exactly
    assert(rows.map(_.getLong(1)).sum == 0L)
    rows.foreach { r =>
      val share = r.getLong(2)
      assert(share >= 0L && share <= 1000000L, r.toString)
    }
  }

  test("watermark: organic text sits near the γ = 1/4 null, counts " +
      "bounded, flags are the z > 4 set") {
    val rows = graft.ops.TextAnalysis.watermarkDetect(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val (g, nb) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    val rate = g.toDouble / nb
    assert(rate > 0.18 && rate < 0.32, s"corpus green rate $rate")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getBoolean(5) == (r.getLong(4) > 4000000L), r.toString)
    }
    // false-positive budget on organic text: z > 4 is ~3e-5 per doc
    assert(rows.count(_.getBoolean(5)) <= rows.length / 50)
  }

  test("plans: watermark is join-free; abtt's corpus pass joins " +
      "nothing; no sort-merge join, no cartesian anywhere") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val wm = plan(graft.ops.TextAnalysis.watermarkDetect(spark, sf))
    assert(!wm.contains("Join"), "watermark must be join-free")
    Seq(
      graft.ops.Evaluation.lengthBias(spark, sf),
      graft.ops.CurationPipeline.doremiStep(spark, sf),
      graft.ops.CurationPipeline.rhoLoss(spark, sf),
      graft.ops.Spectral.abtt(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("SortMergeJoin"), p.linesIterator
        .filter(_.contains("SortMergeJoin")).mkString("\n"))
      assert(!p.contains("CartesianProduct"))
    }
  }
}
