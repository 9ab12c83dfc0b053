package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Evaluation, Graph, Linkage, Maintenance, Relational, TimeSeries, TrainingData}

/** Closed-form invariants for the round-5 batch-two operators:
  * planted-signal checks the sf-corpus gates can't state (a known
  * AUC on a separable fixture, a planted CUSUM level shift), plus
  * bound/consistency invariants on the real corpus. */
class RoundFiveBatchTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents.parquet fixture dir with the given (lang, n_chars). */
  private def docsDir(rows: Seq[(String, Long)]): String = {
    val dir = tmpDir("b2_docs")
    val data = rows.zipWithIndex.map { case ((lang, n), i) =>
      Row(i.toLong, "t", lang, "src", n)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("eval_auc: perfectly separable fixture scores exactly 1.0") {
    val dir = docsDir(
      (1 to 10).map(i => ("en", 100L + i)) ++   // positives all longer
      (1 to 10).map(i => ("de", i.toLong)))
    val r = Evaluation.aucGate(spark, dir).head
    assert(r.getLong(0) == 10 && r.getLong(1) == 10)
    assert(r.getDouble(2) == 1.0)
  }

  test("eval_auc: all-tied scores give exactly 0.5; reversal gives 1-AUC") {
    val tied = docsDir(Seq(("en", 7L), ("en", 7L), ("de", 7L), ("de", 7L)))
    assert(Evaluation.aucGate(spark, tied).head.getDouble(2) == 0.5)
    // Mirror the separable fixture: positives all SHORTER → AUC 0.
    val rev = docsDir(
      (1 to 10).map(i => ("en", i.toLong)) ++
      (1 to 10).map(i => ("de", 100L + i)))
    assert(Evaluation.aucGate(spark, rev).head.getDouble(2) == 0.0)
  }

  test("eval_calibration: bins partition the corpus; rates and preds in range") {
    val out = Evaluation.calibrationGate(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= 0 && bin <= 9)
      val pred = r.getDouble(2); val obs = r.getDouble(3)
      assert(pred >= bin / 10.0 - 1e-9 && pred <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_pred $pred outside bin bounds")
      assert(obs >= 0.0 && obs <= 1.0)
    }
  }

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("ts_changepoint: planted level shift is found at the step") {
    val dir = tmpDir("b2_events")
    // 20 days: value 1.0/day for days 1..10, then 11.0/day for 11..20
    // → CUSUM argmax must sit on day 10 (k = 10).
    val rows = (1 to 20).map { d =>
      Row(d.toLong,
        Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
        1L, "shift", if (d <= 10) 1.0 else 11.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TimeSeries.tsChangepoint(spark, dir).head
    assert(r.getString(0) == "shift")
    assert(r.getLong(2) == 10L, s"cp_index ${r.getLong(2)} != 10")
    assert(r.getDate(1).toString == "2024-01-10")
  }

  test("dq_rule_engine: one row per rule, ppm bounded, counts consistent") {
    val out = DataQuality.ruleEngine(spark, sf).collect()
    assert(out.length == 6)
    val byTable = out.groupBy(_.getString(1))
    // every rule on the same table reports the same n_rows
    byTable.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length == 1)
    }
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
      assert(Set("warn", "fail").contains(r.getString(2)))
    }
  }

  test("ts_interval_union: overlapping intervals count once, gaps don't") {
    val dir = tmpDir("b2_iv")
    // user 1: [0,30m] ∪ [10m,40m] = 40m, then disjoint [2h,2h30m]
    //   → 70 min covered from 3 intervals.
    // user 2: two identical starts → one 30m interval's worth.
    val rows = Seq(
      (1L, "2024-03-01 00:00:00"), (2L, "2024-03-01 00:10:00"),
      (3L, "2024-03-01 02:00:00"), (4L, "2024-03-02 09:00:00"),
      (5L, "2024-03-02 09:00:00")).map { case (id, t) =>
      Row(id, Timestamp.valueOf(t), if (id <= 3) 1L else 2L, "e", 0.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeries.tsIntervalUnion(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 70L)), s"user 1 got ${out(1L)}")
    assert(out(2L) == ((2L, 30L)), s"user 2 got ${out(2L)}")
  }

  test("link_golden_record: each field survives from its own latest generation") {
    val golden = Linkage.goldenRecord(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    val base = Tables.customer(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(3), r.getString(4))).toMap
    assert(golden.keySet == base.keySet)
    base.foreach { case (id, (name, bal, seg)) =>
      val (nv, gName, gBalCents, gSeg) = golden(id)
      val expectedVersions =
        1L + (if (id % 3 == 0) 1L else 0L) + (if (id % 5 == 0) 1L else 0L)
      assert(nv == expectedVersions, s"id $id versions")
      assert(gName == name, s"id $id name must come from gen 1")
      // Balance survives as integer cents (BIGINT): round the base
      // balance to 2 dp FIRST, then +100.00 for gen-3 ids — matching
      // the operator's round-then-add construction on both engines.
      val expCents = new java.math.BigDecimal(bal)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact() +
        (if (id % 5 == 0) 10000L else 0L)
      assert(gBalCents == expCents, s"id $id bal $gBalCents != $expCents")
      val expSeg = if (id % 3 == 0) s"UPD-$seg" else seg
      assert(gSeg == expSeg, s"id $id segment")
    }
  }

  test("graph_label_prop: two planted triangles converge to two communities") {
    val dir = tmpDir("b2_lpa")
    // Two triangles {a1,a2,a3} and {b1,b2,b3}, each edge symmetric
    // weight 2 (two users walking the cycle in opposite directions),
    // one weight-1 bridge a1—b1.
    val walks = Seq(
      (1L, Seq("a1", "a2", "a3", "a1")),
      (2L, Seq("a1", "a3", "a2", "a1")),
      (3L, Seq("b1", "b2", "b3", "b1")),
      (4L, Seq("b1", "b3", "b2", "b1")),
      (5L, Seq("a1", "b1")))
    val rows = for {
      (u, seq) <- walks
      (t, i) <- seq.zipWithIndex
    } yield Row(u * 100 + i, Timestamp.valueOf(
      f"2024-01-01 00:${i}%02d:00"), u, t, 0.0, "{}")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val labs = Graph.labelPropagation(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("a1", "a2", "a3").map(labs) == Set(1L),
      s"A-triangle labels ${labs.view.filterKeys(_.startsWith("a")).toMap}")
    assert(Set("b1", "b2", "b3").map(labs) == Set(4L),
      s"B-triangle labels ${labs.view.filterKeys(_.startsWith("b")).toMap}")
  }

  test("q42_array_hof: Cauchy-Schwarz and count bounds hold on the corpus") {
    val out = Relational.q42ArrayHof(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (norm2, nPos, revDot) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(norm2 >= 0)
      assert(math.abs(revDot) <= norm2,
        s"vec ${r.getLong(0)}: |q·rev(q)|=$revDot > ||q||²=$norm2")
      assert(nPos >= 0)
    }
  }

  test("pack_stratified_exact: allocations are met exactly and sum to the budget") {
    // budget must not exceed the corpus (500 docs at sf0.001)
    val out = TrainingData.stratifiedExact(spark, sf, n = 200).collect()
    assert(out.map(_.getLong(1)).sum == 200L, "Σ alloc != budget")
    assert(out.map(_.getLong(2)).sum == 200L, "Σ sampled != budget")
    out.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"${r.getString(0)}: alloc ${r.getLong(1)} != sampled ${r.getLong(2)}"))
  }

  test("scd2_event_join: every probe resolves to exactly one valid version") {
    val out = Maintenance.scd2EventJoin(spark, sf).collect()
    val probes = Tables.orders(spark, sf).count()
    assert(out.length.toLong == probes,
      s"${out.length} join rows != $probes probes (not a partition)")
    assert(out.map(_.getLong(0)).distinct.length.toLong == probes)
  }

  test("sketch_theta_overlap: exact-mode intersection equals the true overlap") {
    val r = graft.ops.Sketches.thetaOverlap(spark, sf).head
    val ev = Tables.events(spark, sf)
    import org.apache.spark.sql.functions.{col => c}
    val view = ev.filter(c("event_type") === "view")
      .select("user_id").distinct()
    val buy = ev.filter(c("event_type") === "purchase")
      .select("user_id").distinct()
    val trueBoth = view.intersect(buy).count()
    assert(r.getLong(0) == view.count() && r.getLong(1) == buy.count())
    assert(r.getLong(2) == trueBoth,
      s"theta intersection ${r.getLong(2)} != exact $trueBoth")
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
  }

  test("eval_bootstrap_ci: interval is ordered and brackets the point estimate") {
    val r = Evaluation.bootstrapCi(spark, sf).head
    val (point, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lo <= hi, s"ci [$lo, $hi] inverted")
    assert(lo <= point && point <= hi,
      s"point $point outside [$lo, $hi] — implausible for Poisson(1) means")
    assert(r.getLong(3) == 20L)
  }

  test("learn_linreg: planted perfect line recovers slope/intercept, r2 = 1") {
    val dir = tmpDir("b2_lin")
    // y = 3x + 7 exactly
    spark.range(1, 101)
      .selectExpr("cast(id as double) as l_quantity",
        "cast(3 * id + 7 as double) as l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.ops.Learn.linreg(spark, dir).head
    assert(r.getLong(0) == 100L)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 7.0) < 1e-6,
      s"intercept ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12, s"r2 ${r.getDouble(3)}")
  }

  test("text_phrase_search: counts consecutive occurrences only") {
    val dir = tmpDir("b2_phrase")
    val rows = Seq(
      Row(1L, "table scan then a table scan again", "en", "s", 35L),
      Row(2L, "scan table never table then scan", "en", "s", 32L), // reversed
      Row(3L, "a table scan", "en", "s", 12L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextAnalysis.phraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1L)), s"doc 1 got ${out.get(1L)}")
    assert(!out.contains(2L), "reversed-order doc must not match")
    assert(out(3L) == ((1L, 2L)), s"doc 3 got ${out.get(3L)}")
  }

  test("q41_sketch_rollup: daily-sketch merge is lossless and within tolerance") {
    val out = Relational.q41SketchRollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: merge inconsistent")
      assert(r.getBoolean(3), s"${r.getString(0)}: estimate off by >5%")
    }
  }
}
