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

  test("streaming anomaly screen: full plain-Scala replication of " +
      "the judged-against-earlier-batches semantics; batch-mode " +
      "transform plans TransformWithState with zero joins and zero " +
      "flags") {
    val rows = graft.ops.StreamingQueries.streamAnomalyZ(spark, sf)
      .collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._2).map { case (u, rs) =>
      val byBatch = rs.groupBy(r => (r._1 % 3).toInt)
      var (n, s, q, f) = (0L, 0L, 0L, 0L)
      (0 to 2).foreach { b =>
        val xs = byBatch.getOrElse(b, Array.empty[(Long, Long, Long)])
          .map(_._3)
        if (n >= 2L) {
          val varTerm = n * q - s * s
          xs.foreach { x =>
            val d = x * n - s
            if (d * d > 9L * varTerm) f += 1L
          }
        }
        xs.foreach { x => s += x; q += x * x }
        n += xs.length
      }
      u -> (n, f, s / n)
    }
    val got = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect.toMap)
    graft.streaming.EventStreams.withRocksDb(spark) {
      val updates = graft.ops.StreamingQueries.anomalyStateUpdates(
        Tables.events(spark, sf)
          .select(col("event_id"), col("user_id"), col("value")))
        .toDF()
      val plan = updates.queryExecution.executedPlan.toString
      assert(plan.contains("TransformWithState"), plan)
      assert(!plan.linesIterator.exists(_.contains("Join")), plan)
      // one "micro-batch" = no prior state anywhere = zero flags
      assert(updates.collect().forall(_.getLong(4) == 0L))
    }
  }

  test("filter ablation: the grid partitions the corpus, shares sum " +
      "to ~1e6, and each margin matches its source gate") {
    val rows = graft.ops.CurationPipeline.filterAblation(spark, sf)
      .collect()
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") % 101 =!= 0)
    assert(rows.map(_.getLong(3)).sum == corpus.count())
    assert(math.abs(rows.map(_.getLong(5)).sum - 1000000L)
      <= rows.length)
    // dirty margin == the decontaminate gate's corpus-hit count
    val nHit = graft.ops.TrainingData.decontaminate(spark, sf).count()
    assert(rows.filter(!_.getBoolean(2)).map(_.getLong(3)).sum == nHit)
    // quality margin == gopherRules keeps restricted to the corpus
    val nKeep = graft.ops.TextAnalysis.gopherRules(spark, sf)
      .filter(col("doc_id") % 101 =!= 0).filter(col("keep")).count()
    assert(rows.filter(_.getBoolean(0)).map(_.getLong(3)).sum == nKeep)
  }

  test("acf: 14 lags, pair counts step down by one, r bounded, " +
      "significance is the cross-multiplied band rule") {
    val rows = graft.ops.TimeSeries.tsAcf(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1 to 14).map(_.toLong))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) - b.getLong(1) == 1L, s"$a $b")
      case _ =>
    }
    val n = rows.head.getLong(1) + 1 // n_pairs(1) = n − 1
    rows.foreach { r =>
      assert(math.abs(r.getLong(2)) <= 1100000L, r.toString)
      assert(r.getBoolean(3) ==
        (r.getLong(2) * r.getLong(2) * n > 3841600000000L), r.toString)
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

  test("matrix profile plan: the bounded nested loop carries an " +
      "INLINE codegen distance — the zip_with HOF (9.2 s " +
      "interpreted) must never come back; contamination runs joins " +
      "on the gram key, no SMJ, no cartesian") {
    val mp = graft.ops.TimeSeries.tsMatrixProfile(spark, sf)
    val mpPlan = planOf(mp)
    assert(mpPlan.contains("BroadcastNestedLoopJoin"), mpPlan)
    assert(!mpPlan.contains("zip_with") && !mpPlan.contains("ZipWith"),
      "interpreted HOF distance leaked back:\n" + mpPlan)
    assert(!mpPlan.contains("SortMergeJoin"), mpPlan)
    val cr = planOf(graft.ops.TrainingData.contaminationRuns(spark, sf))
    assert(!cr.contains("CartesianProduct"), cr)
    assert(!cr.contains("SortMergeJoin"), cr)
  }

  test("irt: one row per item, exact step-1 difficulty replicated " +
      "from first principles, step-2 move bounded by the learning " +
      "rate") {
    val rows = graft.ops.Evaluation.irtRasch(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("d"))
      .collect()
    val maxd = ev.map(_.getDate(2).toLocalDate).max
    val resp = ev.filter { r =>
      val d = r.getDate(2).toLocalDate
      java.time.temporal.ChronoUnit.DAYS.between(d, maxd) <= 6
    }.map(r => (r.getLong(0), r.getString(1))).distinct
    val nU = ev.map(_.getLong(0)).distinct.length
    val items = ev.map(_.getString(1)).distinct.sorted
    assert(rows.map(_.getString(0)).sameElements(items))
    rows.foreach { r =>
      val si = resp.count(_._2 == r.getString(0)).toLong
      assert(r.getLong(1) == nU && r.getLong(2) == si, r.toString)
      val b1 = math.floor(
        -(si * 2 - nU).toDouble / (nU * 2).toDouble * 1e6 + 0.5).toLong
      assert(r.getLong(3) == b1, r.toString)
      // one η = 1 step moves b by at most 1 (e6-scaled) + rounding
      assert(math.abs(r.getLong(4) - r.getLong(3)) <= 1000001L,
        r.toString)
    }
  }

  test("contamination runs: full brute-force diagonal-run " +
      "replication, flags are the 13-token rule") {
    val rows = graft.ops.TrainingData.contaminationRuns(spark, sf)
      .collect()
    // plain-Scala reference: per (corpus doc, bench doc, diagonal),
    // longest consecutive matched-3-gram run
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).toSeq).toMap
    def grams(t: Seq[String]) =
      if (t.length < 3) Seq.empty
      else t.sliding(3).map(_.mkString(" ")).toSeq
    val bench = docs.filter(_._1 % 101 == 0).map { case (id, t) =>
      id -> grams(t).zipWithIndex
        .groupBy(_._1).map { case (g, ps) => g -> ps.map(_._2) }
    }
    val expect = docs.filter(_._1 % 101 != 0).flatMap { case (id, t) =>
      val gs = grams(t).zipWithIndex
      val runs = scala.collection.mutable.Map
        .empty[(Long, Long), List[Int]] // (bench, diag) -> pds
      for ((g, pd) <- gs; (bid, pmap) <- bench;
           pb <- pmap.getOrElse(g, Nil))
        runs((bid, (pd - pb).toLong)) =
          pd :: runs.getOrElse((bid, (pd - pb).toLong), Nil)
      if (runs.isEmpty) None
      else {
        val lens = runs.values.flatMap { pds =>
          val s = pds.sorted
          s.zipWithIndex.groupBy { case (p, i) => p - i }
            .values.map(_.size)
        }
        Some(id -> (lens.max.toLong, lens.size.toLong))
      }
    }
    val got = rows.map(r =>
      r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap
    assert(got == expect.toMap)
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(4) >= 13L), r.toString)
      assert(r.getLong(4) == r.getLong(3) + 2, r.toString)
    }
  }

  test("lc win rate: pair count matches the bias gate, slope sign " +
      "agrees with the measured bias, control pulls toward 1/2") {
    val r = graft.ops.Evaluation.lcWinRate(spark, sf).collect().head
    val bias = graft.ops.Evaluation.lengthBias(spark, sf).collect()
      .find(_.getString(0) == "ALL").get
    assert(r.getLong(0) == bias.getLong(1), s"$r vs $bias")
    // positive measured bias (longer wins > 50%) ⇔ positive slope
    val biased = bias.getLong(3) - 500000L
    if (math.abs(biased) > 20000L)
      assert(r.getLong(2).sign == biased.sign, s"$r vs $bias")
    // the controlled rate sits no further from 1/2 than the raw rate
    // once the slope has soaked up the length signal
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L, r.toString)
  }

  test("lmg importance: Shapley additivity holds exactly, shares " +
      "and R² are valid, full model dominates each single") {
    val r = graft.ops.Learn.lmgImportance(spark, sf).collect().head
    val (r1, r2, r12) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val (l1, l2) = (r.getLong(4), r.getLong(5))
    assert(math.abs(l1 + l2 - r12) <= 1L, r.toString)
    Seq(r1, r2, r12).foreach(v =>
      assert(v >= 0L && v <= 1000000L, r.toString))
    assert(r12 + 1 >= math.max(r1, r2), r.toString)
  }

  test("matrix profile: full brute-force replication on the daily " +
      "series, exclusion zone respected") {
    val rows = graft.ops.TimeSeries.tsMatrixProfile(spark, sf)
      .collect()
    val v = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))" +
        " * 100 AS BIGINT) div 1000 AS BIGINT)").as("v"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = v.length
    val m = 7
    assert(rows.length == n - m + 1)
    val subs = (0 to n - m).map(i => v.slice(i, i + m))
    rows.foreach { r =>
      val i = r.getLong(0).toInt - 1
      var best = (Long.MaxValue, Long.MaxValue)
      for (j <- 0 to n - m if math.abs(i - j) >= m / 2) {
        var d2 = 0L
        var k = 0
        while (k < m) {
          val d = subs(i)(k) - subs(j)(k); d2 += d * d; k += 1
        }
        if (d2 < best._1 || (d2 == best._1 && (j + 1).toLong < best._2))
          best = (d2, (j + 1).toLong)
      }
      assert(r.getLong(1) == best._1 && r.getLong(2) == best._2,
        s"$r vs $best")
      assert(math.abs(r.getLong(0) - r.getLong(2)) >= m / 2, r.toString)
    }
  }

  test("platt: step-1 coefficients replicated exactly from first " +
      "principles; step-2 moves bounded") {
    val r = graft.ops.Evaluation.plattScaling(spark, sf).collect().head
    val base = Tables.documents(spark, sf)
      .select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = base.length.toLong
    val p = base.map(_._2).sum
    val ga = base.map { case (sc, y) => sc * (1 - 2 * y) }.sum
    val a1 = math.floor(-ga.toDouble / (n * 2000L).toDouble * 1e6 + 0.5)
      .toLong
    val b1 = math.floor(-(n - 2 * p).toDouble / (n * 2L).toDouble * 1e6
      + 0.5).toLong
    assert(r.getLong(0) == n && r.getLong(1) == p, r.toString)
    assert(r.getLong(2) == a1 && r.getLong(3) == b1, r.toString)
    assert(math.abs(r.getLong(4) - r.getLong(2)) <= 1000001L, r.toString)
    assert(math.abs(r.getLong(5) - r.getLong(3)) <= 1000001L, r.toString)
  }
}
