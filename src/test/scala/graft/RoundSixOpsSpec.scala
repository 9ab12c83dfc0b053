package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Graph, LanguageModel, Linkage, Maintenance, ParityQueries, Relational}

/** Planted-fixture invariants for the round-6 operator batch:
  * skyline dominance, native recursive-CTE traversal, Bellman–Ford
  * shortest paths, Fellegi–Sunter classification, and the
  * incremental-join-maintenance == full-recompute contract. */
class RoundSixOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  private def partsDir(rows: Seq[(Long, Int, Double)]): String = {
    val dir = tmpDir("r6_parts")
    val data = rows.map { case (k, sz, pr) =>
      Row(k, s"part$k", "B", "T", sz, pr)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), partSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("q45_skyline: planted frontier, ties on both axes kept") {
    // (key, size, price): frontier is {2, 6} (share the best corner
    // (20, 3.0) — equal pairs never dominate each other) and {5}
    // (cheapest overall). 3 is beaten by 2 on both axes, 4 by 2 on
    // price at equal size, 1 by everything larger-and-cheaper.
    val dir = partsDir(Seq(
      (1L, 10, 5.0), (2L, 20, 3.0), (3L, 15, 4.0),
      (4L, 20, 6.0), (5L, 5, 2.0), (6L, 20, 3.0)))
    val got = Relational.q45Skyline(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert(got === Set(2L, 5L, 6L))
  }

  test("q46_recursive_cte: full binary tree levels via WITH RECURSIVE") {
    // parts 1..31 under parent(k) = k div 2 form a complete 5-level
    // binary tree — per-depth counts must be exactly 2^depth.
    val dir = partsDir((1L to 31L).map(k => (k, 1, 1.0)))
    val got = Relational.q46Recursive(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got === Map(0 -> 1L, 1 -> 2L, 2 -> 4L, 3 -> 8L, 4 -> 16L))
  }

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("graph_sssp: relay route beats the expensive direct edge") {
    // 10 users walk A→B (cost 1e6/10), 5 walk B→C (1e6/5), 1 walks
    // A→C (1e6/1): shortest A→C is the two-hop 300000, not 1000000.
    val dir = tmpDir("r6_ev")
    def walk(u: Long, steps: Seq[String], base: Long) =
      steps.zipWithIndex.map { case (t, i) =>
        Row(base + i, new Timestamp(1700000000000L + i * 1000), u, t,
          1.0, "{}")
      }
    val rows =
      (1L to 10L).flatMap(u => walk(u, Seq("A", "B"), u * 100)) ++
      (11L to 15L).flatMap(u => walk(u, Seq("B", "C"), u * 100)) ++
      walk(16L, Seq("A", "C"), 1600)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d = Graph.sssp(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d === Map("A" -> 0L, "B" -> 100000L, "C" -> 300000L))
  }

  test("link_fellegi_sunter: every true pair classified match") {
    val res = Linkage.fellegiSunter(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byPair = res.map { case (d, c, dec) => (d, c) -> dec }.toMap
    val dirtyIds = res.map(_._1).distinct
    assert(dirtyIds.nonEmpty)
    dirtyIds.foreach { d =>
      assert(byPair.get((d, d - 100000L)).contains("match"),
        s"true pair for dirty $d not matched")
    }
    // scores are symmetric functions of the three field comparisons:
    // only the seven reachable sums may appear
    val scores = Linkage.fellegiSunter(spark, sf)
      .select("score").collect().map(_.getLong(0)).toSet
    assert(scores.size <= 8)
  }

  test("text_kneser_ney: hand-computed probabilities on a tiny corpus") {
    // "a b a b a c": bigrams ab(2), ba(2), ac(1); c1(a)=3, c1(b)=2;
    // N1+(a·)=2, N1+(b·)=1; N1+(·b)=1, N1+(·a)=1, N1+(·c)=1; T=3.
    val dir = tmpDir("r6_kn")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "a b a b a c", "en", "s", 11L)), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LanguageModel.kneserNey(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // P(b|a) = ((4·2−3)·3 + 3·2·1)/(4·3·3) = 21/36; P(a|b) = 18/24;
    // P(c|a) = (3 + 6)/36 — discount mass flows to continuations.
    assert(got === Map("a b" -> 583333L, "b a" -> 750000L,
      "a c" -> 250000L))
  }

  test("conv_weblog_parse: parsed aggregate equals source-derived") {
    val parsed = ParityQueries.convWeblogParse(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy(concat(lit("/"), col("event_type")).as("path"))
      .agg(count(lit(1)).as("n_req"),
        countDistinct(col("user_id")).as("n_ips"),
        sum(col("event_id") % 10000).as("sum_bytes"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("n_304"),
        date_trunc("second", min(col("ts"))).as("min_ts"),
        date_trunc("second", max(col("ts"))).as("max_ts"))
    assert(parsed.exceptAll(direct).isEmpty &&
      direct.exceptAll(parsed).isEmpty)
  }

  test("ts_attribution_markov: removing the only converting channel " +
      "zeroes conversion") {
    // 10 users convert through view; 10 bounce through click. Full
    // P(conv) = 0.5; removing view kills every conversion path,
    // removing click changes nothing.
    val dir = tmpDir("r6_attr")
    val rows =
      (1L to 10L).flatMap { u =>
        Seq(Row(u * 10, new Timestamp(1700000000000L), u, "view", 1.0, "{}"),
          Row(u * 10 + 1, new Timestamp(1700000001000L), u, "purchase",
            1.0, "{}"))
      } ++
      (11L to 20L).map { u =>
        Row(u * 10, new Timestamp(1700000000000L), u, "click", 1.0, "{}")
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.attributionMarkov(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got === Set(("view", 500000L, 500000L),
      ("click", 500000L, 0L)))
  }

  test("curate_set_cover: greedy picks max marginal bigram gain, " +
      "zero-gain ties to smallest id") {
    val dir = tmpDir("r6_cover")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e f"), (3L, "x y z"),
      (4L, "a b"), (5L, "p q"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.map { case (i, t) => Row(i, t, "en", "s", t.length.toLong) },
        2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.CurationPipeline.setCover(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 5L), (2L, 3L, 2L), (3L, 5L, 1L),
      (4L, 1L, 0L), (5L, 4L, 0L)))
  }

  test("text_bpe_apply: subword counts bounded and deterministic") {
    val a = LanguageModel.bpeApply(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (nw, nt) = (r.getLong(1), r.getLong(2))
      assert(nt >= nw, "at least one subword per word")
    }
    // 4 merges must compress SOMETHING corpus-wide
    val chars = spark.read
      .parquet(s"$sf/documents.parquet")
      .selectExpr("sum(length(text))").collect()(0).getLong(0)
    assert(a.map(_.getLong(2)).sum < chars)
    val b = LanguageModel.bpeApply(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("embed_coreset: farthest-point traversal on planted corners") {
    val dir = tmpDir("r6_core")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(0L, Seq(0f, 0f), 0), Row(1L, Seq(1f, 0f), 0),
      Row(2L, Seq(0f, 1f), 0), Row(3L, Seq(10f, 10f), 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.kCenterCoreset(spark, dir, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 0L, 0.0), (2L, 3L, 200.0),
      (3L, 1L, 1.0), (4L, 2L, 1.0)))
  }

  test("ts_time_weighted_avg: holds weight by duration, not count") {
    // user 1: value 10 held 9s then value 100 held 1s then end —
    // TWA = (10·9 + 100·1)/10 = 19, NOT the plain mean 55 (the final
    // reading's value never contributes).
    val dir = tmpDir("r6_twa")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "view", 10.0, "{}"),
      Row(2L, new Timestamp(1700000009000L), 1L, "view", 100.0, "{}"),
      Row(3L, new Timestamp(1700000010000L), 1L, "view", 777.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.TimeSeries.timeWeightedAvg(spark, dir).collect()(0)
    assert(r.getLong(1) === 190000L) // 19.0 in 1e-4 units
    assert(r.getLong(2) === 10000000L) // 10 s span in micros
  }

  test("dedup_url_canonical: every variant pair collapses, keeper is " +
      "the dirty-form doc") {
    val g = graft.ops.Dedup.urlCanonical(spark, sf).collect()
    // sf0.001 documents: 50 docs = pairs {d, d+20} for d%40<20 plus a
    // tail block without partners
    val byN = g.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byN.getOrElse(2L, 0) > 0, s"no collapsed pairs: $byN")
    g.filter(_.getLong(1) == 2L).foreach { r =>
      val keeper = r.getLong(2)
      assert((keeper / 20) % 2 == 0, s"keeper $keeper is not the v0 doc")
    }
    // canonical forms carry no tracking noise
    g.foreach { r =>
      val c = r.getString(0)
      assert(!c.contains("utm_") && !c.contains("#") &&
        !c.contains(":443") && !c.endsWith("/"), c)
      assert(c.startsWith("https://www."), c)
    }
  }

  test("mine_seq_patterns: order-sensitive, gap-tolerant support") {
    // user 1: A then B. user 2: B, A, B — exhibits BOTH A→B (gap over
    // the middle) and B→A. Support is per-user existence, not counts.
    val dir = tmpDir("r6_seq")
    val rows = Seq(
      Row(1L, new Timestamp(1000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(2000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1000L), 2L, "B", 1.0, "{}"),
      Row(4L, new Timestamp(2000L), 2L, "A", 1.0, "{}"),
      Row(5L, new Timestamp(3000L), 2L, "B", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.Mining.seqPatterns(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("A", "B", 2L), ("B", "A", 1L)))
  }

  test("dq_k_anonymity: class accounting is internally consistent") {
    val r = graft.ops.DataQuality.kAnonymity(spark, sf).collect()(0)
    val (classes, risky, riskyRows) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(classes > 0 && risky <= classes)
    assert(riskyRows < 5 * risky + 1) // every risky class holds < k rows
    assert(r.getLong(3) <= r.getLong(4)) // min ≤ max class size
  }

  test("text_readability: hand-computed Flesch on a planted doc") {
    val dir = tmpDir("r6_read")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // "the cat sat. it ran." → 5 space-split words, 2 sentence
    // terminators, 5 vowel groups (e, a, a, i, a)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "the cat sat. it ran.", "en", "s", 20L)), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.TextAnalysis.readability(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((5L, 2L, 5L)))
    val f = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    assert(r.getLong(4) === math.floor(f * 1000.0 + 0.5).toLong)
  }

  test("graph_hits: pure source is the hub, pure sink the authority") {
    val dir = tmpDir("r6_hits")
    val rows = (1L to 3L).flatMap { u =>
      Seq(Row(u * 10, new Timestamp(1700000000000L), u, "A", 1.0, "{}"),
        Row(u * 10 + 1, new Timestamp(1700000001000L), u, "B", 1.0, "{}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.hits(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map("A" -> ((1000000L, 0L)), "B" -> ((0L, 1000000L))))
  }

  test("ts_funnel_windowed: conversion outside the budget is dropped") {
    val dir = tmpDir("r6_fw")
    val h = 3600000L // one hour in millis
    val rows = Seq(
      // user 1: click 30 min after view — inside the budget
      Row(1L, new Timestamp(1700000000000L), 1L, "view", 1.0, "{}"),
      Row(2L, new Timestamp(1700000000000L + h / 2), 1L, "click", 1.0, "{}"),
      // user 2: click 2 h after view — outside
      Row(3L, new Timestamp(1700000000000L), 2L, "view", 1.0, "{}"),
      Row(4L, new Timestamp(1700000000000L + 2 * h), 2L, "click", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.funnelWindowed(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("1_view") === 2L)
    assert(got("2_click_1h") === 1L)
    assert(got("3_purchase_1h") === 0L)
  }

  test("learn_stump: perfectly separable fixture splits cleanly") {
    val dir = tmpDir("r6_stump")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows =
      (0 until 10).map(i => Row(i.toLong, "t", "en", "s", 10L + i)) ++
      (0 until 10).map(i => Row(10L + i, "t", "de", "s", 110L + i))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Learn.stump(spark, dir).collect()(0)
    // ties across all fully-separating edges → lowest bin (1);
    // threshold = 10 + 2·110 div 16 = 23; gain = 20·ln2 exactly
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 23L)
    assert(r.getLong(2) === math.round(20.0 * math.log(2.0) * 1e6))
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((10L, 0L, 0L, 10L)))
  }

  test("learn_gbdt_round: residual round finds the secondary split") {
    // Three clusters: lows (y=1), mids (y=0), highs (y=1). Round 1
    // ties between the two clean edges and takes the lower (after the
    // lows); the right leaf then holds mids (residual −½) and highs
    // (+½), so round 2 MUST split between them — a different edge
    // than round 1, which is the whole point of boosting.
    val dir = tmpDir("r6_gbdt")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows =
      (0 until 10).map(i => Row(i.toLong, "t", "en", "s", 10L + i)) ++
      (0 until 10).map(i => Row(10L + i, "t", "de", "s", 60L + i)) ++
      (0 until 10).map(i => Row(20L + i, "t", "en", "s", 110L + i))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Learn.gbdtRound(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 23L)))        // bin1, thr1
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((10L, 10L, 10L, 20L)))                                   // s/c per side
    assert((r.getLong(6), r.getLong(7)) === ((8L, 71L)))        // bin2, thr2
    assert((r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11)) ===
      ((-1000L, 20L, 1000L, 10L)))                              // t/n per side
    assert(r.getLong(12) === 200L)                              // d = nL·nR
  }

  test("dq_freshness: stale stream flagged against the corpus clock") {
    // stream A last seen at the corpus max; stream B two hours behind
    val dir = tmpDir("r6_fresh")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "B", 1.0, "{}"),
      Row(2L, new Timestamp(1700007200000L), 1L, "A", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.DataQuality.freshness(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got === Map("A" -> ((0L, true)), "B" -> ((7200L, false))))
  }

  test("eval_mcnemar: discordant counts reconcile with the statistic") {
    val r = graft.ops.Evaluation.mcnemar(spark, sf).collect()(0)
    val (n, b, c, chi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(b + c <= n)
    if (b + c > 0)
      assert(chi === ((b - c) * (b - c) * 1000) / (b + c))
    else assert(chi === 0L)
  }

  test("sim_mmr_rerank: redundancy penalty diversifies the ranking") {
    // query at the origin-ish; two near-identical relevant docs and
    // one moderately relevant but orthogonal doc: plain top-2 takes
    // the twins; MMR must pick the orthogonal doc second.
    val dir = tmpDir("r6_mmr")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // candidates cluster off-axis: two near-twins above the query
    // direction, one mirror doc below — equally relevant but
    // orthogonal-ish to the twins, so round 2 must cross the axis
    val rows = Seq(
      Row(0L, Seq(1f, 0f), 0),            // query
      Row(1L, Seq(0.9f, 0.44f), 0),       // twin A
      Row(2L, Seq(0.9f, 0.45f), 0),       // twin B (≈A)
      Row(3L, Seq(0.9f, -0.44f), 0))      // mirror: same relevance
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.mmrRerank(spark, dir, k = 3, pool = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got(0)._2 === 1L)   // most relevant first
    assert(got(1)._2 === 3L)   // diversity beats the twin
    assert(got(2)._2 === 2L)
  }

  test("text_js_divergence: identical domain scores zero, drifted " +
      "domain positive") {
    val dir = tmpDir("r6_jsd")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "alpha beta gamma", "en", "src0", 16L),
      Row(2L, "alpha beta gamma", "en", "srcSame", 16L),
      Row(3L, "delta epsilon zeta", "en", "srcDrift", 18L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.jsDivergence(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("srcSame") === 0L)
    // disjoint vocab: JSD = ln 2, so 2·JSD·1e9 = 2·ln2·1e9 (a few
    // nano-units of per-term snapping slack)
    val expected = math.round(2.0 * math.log(2.0) * 1e9)
    assert(math.abs(got("srcDrift") - expected) <= 10L,
      s"${got("srcDrift")} vs $expected")
  }

  test("learn_tree_depth2: leaves account for every row, gains " +
      "non-negative") {
    val t = graft.ops.Learn.treeDepth2(spark, sf).collect()
    assert(t.map(_.getString(0)).toSeq === Seq("L", "R"))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val covered = t.map(r =>
      r.getLong(4) + r.getLong(5) + r.getLong(6) + r.getLong(7)).sum
    assert(covered === total)
    t.foreach(r => assert(r.getLong(3) >= 0L))
  }

  test("mine_assoc_rules: directed pair, conf asymmetric, lift " +
      "symmetric") {
    val rules = graft.ops.Mining.assocRules(spark, sf, minSup = 2L,
        minConfPpm = 0L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rules.nonEmpty)
    rules.foreach { case ((a, b), (nPair, _, lift)) =>
      val rev = rules((b, a)) // every rule's mirror must exist
      assert(rev._1 === nPair, s"support asymmetric for ($a,$b)")
      assert(rev._3 === lift, s"lift asymmetric for ($a,$b)")
    }
    // confidence is a floor-division ppm: never above 1e6
    rules.values.foreach { case (_, conf, _) =>
      assert(conf > 0L && conf <= 1000000L)
    }
  }

  test("ts_seasonal_anomaly: spike judged against its OWN hour") {
    // hour 0: constant 10s (sd 0 → no outliers). hour 1: five 10s and
    // one 110 — spike z = √5 > 2, flagged; a season-blind screen over
    // all 12 rows would smear the baselines.
    val dir = tmpDir("r6_season")
    val rows =
      (0 until 6).map(i => Row(i.toLong,
        new Timestamp(1700000000000L + i * 1000), 1L, "A", 10.0, "{}")) ++
      (0 until 5).map(i => Row(10L + i,
        new Timestamp(1700003600000L + i * 1000), 1L, "A", 10.0, "{}")) ++
      Seq(Row(20L, new Timestamp(1700003605000L), 1L, "A", 110.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.tsSeasonalAnomaly(spark, dir)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getLong(3))))
      .toMap
    val hours = got.keySet
    assert(hours.size === 2)
    val (h0, h1) = (hours.min, hours.max)
    assert(got(h0) === ((6L, 0L)))
    assert(got(h1) === ((6L, 1L)))
  }

  test("dedup_span_union: overlapping dup spans merge to exact " +
      "character coverage") {
    // Docs share an 80-char block (stride-aligned); the five
    // overlapping 40-grams it spawns must union to exactly 80 chars,
    // not 5×40. The third doc shares nothing.
    val dir = tmpDir("r6_union")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val shared = "0123456789" * 8
    val rows = Seq(
      Row(1L, shared + "a" * 40, "en", "s", 120L),
      Row(2L, "b" * 40 + shared, "en", "s", 120L),
      Row(3L, "c" * 120, "en", "s", 120L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.spanUnion(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((120L, 80L, 666666L)))
    assert(got(2L) === ((120L, 80L, 666666L)))
    assert(got(3L) === ((120L, 0L, 0L)))
  }

  test("embed_gram_matrix + embed_pca_power: hand-computed moments " +
      "and eigen-direction on planted axes") {
    // Two docs on the x-axis, one on y: G = [[2e6, 0], [0, 1e6]].
    // Power iteration from (1e4, 1e4) halves the minor component per
    // round: x4 = (10000, 625) exactly.
    val dir = tmpDir("r6_gram")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(1L, Seq(1f, 0f), 0), Row(2L, Seq(1f, 0f), 0),
      Row(3L, Seq(0f, 1f), 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val g = graft.ops.Spectral.gramMatrix(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(g === Map((1L, 1L) -> 2000000L, (1L, 2L) -> 0L,
      (2L, 2L) -> 1000000L))
    val x = graft.ops.Spectral.pcaPower(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(x === Map(1L -> 10000L, 2L -> 625L))
  }

  test("learn_woe_iv: pure bins carry sign-correct evidence, " +
      "accounting closes") {
    val dir = tmpDir("r6_woe")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows =
      (0 until 10).map(i => Row(i.toLong, "t", "en", "s", 10L + i)) ++
      (0 until 10).map(i => Row(10L + i, "t", "de", "s", 110L + i))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Learn.woeIv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).sum === 10L && got.map(_._3).sum === 10L)
    got.foreach { case (bin, pos, neg, woe, iv) =>
      if (pos > 0 && neg == 0) assert(woe > 0L && iv > 0L, s"bin $bin")
      if (neg > 0 && pos == 0) assert(woe < 0L && iv > 0L, s"bin $bin")
    }
    // the separable fixture carries real information: total IV large
    assert(got.map(_._5).sum > 1000000000L) // IV > 1.0
  }

  test("embed_knn_classify: neighborhood vote overrules the point's " +
      "own label") {
    // A mislabeled point inside cluster 0: its 3 nearest neighbors
    // all carry label 0 vs 2 far label-1 points — the vote must say 0
    // and flag correct=false.
    val dir = tmpDir("r6_knn")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(0L, Seq(1f, 0f), 9),
      Row(1L, Seq(0.9f, 0.1f), 0), Row(2L, Seq(0.95f, 0.05f), 0),
      Row(3L, Seq(0.85f, 0.15f), 0),
      Row(4L, Seq(0f, 1f), 1), Row(5L, Seq(0.05f, 1f), 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.knnClassify(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got(0L) === ((9L, 0L, 3L, false)))
    assert(got(1L)._2 === 0L && got(1L)._4)
    // k = 5 > cluster-1 size: even the genuine label-1 point is
    // outvoted 3-1 by the majority cluster — the small-class failure
    // mode k-NN is known for, reproduced exactly
    assert(got(4L) === ((1L, 0L, 3L, false)))
  }

  test("eval_pr_curve: recall monotone to 1, precision consistent " +
      "with counts") {
    val pts = graft.ops.Evaluation.prCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(pts.nonEmpty)
    // rows ordered by score asc: tp/fp are suffix sums, so they must
    // DECREASE with score; the lowest threshold captures everything
    pts.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3, s"suffix sums not monotone")
    }
    val lowest = pts.head
    assert(lowest._5 === 1.0)
    pts.foreach { case (_, tp, fp, prec, _) =>
      assert(math.abs(prec - tp.toDouble / (tp + fp)) < 1e-12)
    }
  }

  test("ts_decompose: planted spike splits into trend lift, own-hour " +
      "seasonal, zero residual") {
    // 49 hourly points, constant 10 except a 35 spike at hour 24:
    // every full 25-point window contains the spike, so trend = 11
    // across hours 12..36; each hour-of-day has one interior sample,
    // so seasonal absorbs the whole deviation and residuals vanish.
    val dir = tmpDir("r6_decomp")
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    val rows = (0 until 49).map { h =>
      val v = if (h == 24) 35.0 else 10.0
      Row(h.toLong, new Timestamp(base + h * 3600000L), 1L, "A", v, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.tsDecompose(spark, dir).collect()
      .map(r => (r.getTimestamp(1).getTime - base) / 3600000L ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .toMap
    assert(got.size === 49)
    assert(got(24L) === ((Some(11.0), Some(24000000L), Some(0L))))
    assert(got(18L) === ((Some(11.0), Some(-1000000L), Some(0L))))
    assert(got(5L)._1 === None) // edge: incomplete window, no trend
  }

  test("graph_modularity: accounting closes against the transition " +
      "graph and the emitted q-terms reproduce") {
    val rows = Graph.modularity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // m from the independent transitions gate (src<>dst edges only)
    val m = Graph.transitions(spark, sf)
      .filter(col("src") =!= col("dst"))
      .agg(sum(col("w"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum === m, "out-degrees must sum to m")
    assert(rows.map(_._4).sum === m, "in-degrees must sum to m")
    rows.foreach { case (lab, ein, wout, win, q) =>
      assert(ein <= math.min(wout, win), s"community $lab overcounts")
      val expect = math.floor((ein.toDouble / m.toDouble -
        (wout.toDouble * win.toDouble) / (m.toDouble * m.toDouble))
        * 1e9 + 0.5).toLong
      assert(q === expect, s"q-term mismatch for community $lab")
    }
    // communities are exactly the label-propagation labels
    val labs = Graph.labelPropagation(spark, sf)
      .select("lab").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet === labs)
  }

  test("eval_cohens_kappa: perfect agreement scores exactly 1.0, " +
      "accounting closes") {
    // long docs contain 'the', short ones don't — the two raters
    // agree on every row: po = 1e6 and kappa = 1e6 regardless of pe.
    val dir = tmpDir("r6_kappa")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "x", "en", "s", 10L), Row(2L, "y", "en", "s", 10L),
      Row(3L, "the long one", "en", "s", 100L),
      Row(4L, "the other long", "en", "s", 100L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Evaluation.cohensKappa(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((4L, 4L)))
    assert(r.getLong(4) === 1000000L)          // po
    assert(r.getLong(5) === 500000L)           // pe from 2/4 marginals
    assert(r.getLong(6) === 1000000L)          // kappa = 1 exactly
  }

  test("ts_forecast_snaive: same-hour-yesterday errors, hand-computed") {
    val dir = tmpDir("r6_snaive")
    val day = 86400000L
    val base = 1704067200000L // 2024-01-01 00:00 UTC
    val rows = Seq(
      // hod 0: 10 then 13 (err +3); hod 1: 5 then 3 (err -2)
      Row(1L, new Timestamp(base), 1L, "A", 10.0, "{}"),
      Row(2L, new Timestamp(base + 3600000L), 1L, "A", 5.0, "{}"),
      Row(3L, new Timestamp(base + day), 1L, "A", 13.0, "{}"),
      Row(4L, new Timestamp(base + day + 3600000L), 1L, "A", 3.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.TimeSeries.tsForecastSnaive(spark, dir).collect()(0)
    assert(r.getString(0) === "A")
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 2.5)  // (|3| + |-2|) / 2
    assert(r.getDouble(3) === 0.5)  // (3 - 2) / 2
  }

  test("text_pmi_bigrams: the rarer perfectly-associated pair " +
      "outranks the common one, value hand-computed") {
    // 'new york' (6 of 26 bigrams) and 'a b' (20 of 26) are both
    // perfectly associated; PMI must prefer the RARER pair — the
    // whole point of PMI over raw counts.
    val dir = tmpDir("r6_pmi")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows =
      (0 until 6).map(i => Row(i.toLong, "new york", "en", "s", 8L)) ++
      (0 until 20).map(i => Row(10L + i, "a b", "en", "s", 3L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.LanguageModel.pmiBigrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq("new york", "a b"))
    val exp = math.floor((math.log(6.0) - math.log(26.0) -
      math.log(6.0) + math.log(52.0) - math.log(6.0) +
      math.log(52.0)) * 1e6 + 0.5).toLong
    assert(got(0)._3 === exp)
  }

  test("ts_retention: cohort matrix from planted first-touch days") {
    val dir = tmpDir("r6_ret")
    val day = 86400000L
    val base = 1704067200000L
    def ev(id: Long, u: Long, dayN: Int) =
      Row(id, new Timestamp(base + dayN * day + u * 1000), u, "A",
        1.0, "{}")
    val rows = Seq(
      ev(1, 1, 0), ev(2, 1, 2),   // user1: cohort d0, back on d2
      ev(3, 2, 0),                // user2: cohort d0 only
      ev(4, 3, 1), ev(5, 3, 2))   // user3: cohort d1, back on d2
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.tsRetention(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("ts_rfm: scores bounded, segment composes, formula closes") {
    val rows = graft.ops.TimeSeries.tsRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, rs, fs, ms, seg) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 &&
        ms >= 1 && ms <= 5, s"user $u scores out of range")
      assert(seg === rs * 100 + fs * 10 + ms, s"user $u segment")
    }
    // quintile scoring must actually spread: more than one distinct
    // score on at least one axis
    assert(rows.map(_._2).distinct.size > 1 ||
      rows.map(_._3).distinct.size > 1 || rows.map(_._4).distinct.size > 1)
  }

  test("embed_outliers: the planted corrupted vector tops the screen, " +
      "dead dims contribute zero") {
    val dir = tmpDir("r6_outl")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = (1L to 9L).map(i =>
      Row(i, Seq(1f, 0f, 7f), 0)) :+ Row(10L, Seq(0f, 50f, 7f), 0)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.embedOutliers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.head._1 === 10L)
    assert(got.head._2 > got(1)._2 * 5, "corrupted vector must dominate")
    got.foreach { case (_, s) => assert(s >= 0L) }
  }

  test("graph_closeness: directed path distances, unreachable sink " +
      "scores zero") {
    // Single walk A -> B -> C: closeness(A) = 2/(1+2), closeness(B) =
    // 1/1, C reaches nothing.
    val dir = tmpDir("r6_close")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(1700000001000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1700000002000L), 1L, "C", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.closeness(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "A" -> ((2L, 3L, 666666L)),
      "B" -> ((1L, 1L, 1000000L)),
      "C" -> ((0L, 0L, 0L))))
  }

  test("dedup_novelty_curve: first owner keeps the grams, repeats " +
      "score zero") {
    // doc 1 owns the shared 80-char block; doc 2 repeats it plus a
    // fresh tail; doc 3 is all fresh.
    val dir = tmpDir("r6_novel")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val shared = "0123456789" * 8
    val rows = Seq(
      Row(1L, shared, "en", "s", 80L),
      Row(2L, shared + "a" * 40, "en", "s", 120L),
      Row(3L, "c" * 80, "en", "s", 80L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.noveltyCurve(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc1: 5 grams, all novel. doc2: 9 grams — the periodic shared
    // block contributes only already-seen grams through position 40
    // (period 10 makes gram(40) == gram(0..30)); novel grams are the
    // 4 crossing into the fresh tail. doc3: its periodic 'c' text
    // collapses to 5 copies of ONE novel gram.
    assert(got(1L) === ((5L, 5L, 1000000L)))
    assert(got(2L) === ((9L, 4L, 444444L)))
    assert(got(3L) === ((5L, 5L, 1000000L)))
  }

  test("eval_brier: integer residual accounting reproduces the score") {
    val r = graft.ops.Evaluation.brierScore(spark, sf).collect()(0)
    val (n, sse, brier) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n > 0 && sse >= 0)
    assert(math.abs(brier -
      math.round(sse.toDouble / (n * 16000000.0) * 1e6) / 1e6.toDouble)
      < 1e-9)
    assert(brier >= 0.0 && brier <= 1.0)
  }

  test("graph_betweenness: diamond splits the shortest-path credit " +
      "exactly in half") {
    // A->B->C and A->D->C: two shortest A..C paths, so B and D each
    // carry sigma_sv*sigma_vt/sigma_st = 1/2; endpoints carry none.
    val dir = tmpDir("r6_btw")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(1700000001000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1700000002000L), 1L, "C", 1.0, "{}"),
      Row(4L, new Timestamp(1700000000000L), 2L, "A", 1.0, "{}"),
      Row(5L, new Timestamp(1700000001000L), 2L, "D", 1.0, "{}"),
      Row(6L, new Timestamp(1700000002000L), 2L, "C", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.betweenness(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("A" -> 0L, "B" -> 500000000L,
      "C" -> 0L, "D" -> 500000000L))
  }

  test("graph_eccentricity: path graph extremes, diameter and radius") {
    // A->B->C: ecc(A)=2, ecc(B)=1, ecc(C)=0 (finite eccentricity
    // over reachable nodes); diameter 2, radius 0 on every row.
    val dir = tmpDir("r6_ecc")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(1700000001000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1700000002000L), 1L, "C", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.eccentricity(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map(
      "A" -> ((2L, 2L, 2L, 0L)),
      "B" -> ((1L, 1L, 2L, 0L)),
      "C" -> ((0L, 0L, 2L, 0L))))
  }

  test("graph_scc: directed cycle collapses, tail stays its own " +
      "component") {
    // u1 walks A,B,A (edges A->B, B->A: a 2-cycle); u2 walks B,C.
    // SCC {A,B} labels A (size 2); C is alone (size 1).
    val dir = tmpDir("r6_scc")
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(1700000001000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1700000002000L), 1L, "A", 1.0, "{}"),
      Row(4L, new Timestamp(1700000000000L), 2L, "B", 1.0, "{}"),
      Row(5L, new Timestamp(1700000001000L), 2L, "C", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.scc(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      "A" -> (("A", 2L)), "B" -> (("A", 2L)), "C" -> (("C", 1L))))
  }

  test("eval_ece: integer gap accounting reproduces the metric") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val gaps = docs.groupBy { case (nc, _) =>
        math.min(nc, 3999L) * 10L / 4000L }
      .map { case (_, rows) =>
        val sumNum = rows.map(r => math.min(r._1, 4000L)).sum
        val nPos = rows.count(_._2 == "en").toLong
        (rows.size.toLong, math.abs(sumNum - 4000L * nPos))
      }
    val n = docs.length.toLong
    val expEce = gaps.map(_._2).sum * 1000000L / (4000L * n)
    val expMce = gaps.map { case (nb, g) => g * 1000000L / (4000L * nb) }.max
    val r = graft.ops.Evaluation.eceGate(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1).toInt, r.getLong(2), r.getLong(3))
      === ((n, gaps.size, expEce, expMce)))
  }

  test("dq_cramers_v: reconciles with the chi2 gate and stays in " +
      "[0, 1]") {
    val r = graft.ops.DataQuality.dqCramersV(spark, sf).collect()(0)
    val (n, rr, cc, chi2e6, v) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    val perType = graft.ops.DataQuality.dqChi2(spark, sf).collect()
      .map(x => math.round(x.getDouble(1) * 1e6)).sum
    assert(chi2e6 === perType)
    assert(v >= 0.0 && v <= 1.0)
    assert(math.abs(v - math.sqrt(
      chi2e6.toDouble / 1e6 / (n * math.min(rr - 1, cc - 1)))) < 1e-12)
  }

  test("mine_triples: planted baskets, Apriori prune reproduces " +
      "brute force") {
    // baskets {1,2,3}, {1,2,3,4}, {1,2,4}: triples (1,2,3) and
    // (1,2,4) each appear twice; every other triple once only.
    val dir = tmpDir("r6_tri")
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L), (3L, 4L))
    spark.createDataFrame(rows).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Mining.tripleGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got === Map((1L, 2L, 3L) -> 2L, (1L, 2L, 4L) -> 2L))
  }

  test("ts_cross_corr: planted one-day lead yields r = 1 at lag 1") {
    // A counts [2,4,6,0] on Jan 1-4; B counts [0,2,4,6] — B is A
    // shifted one day. Exact r per lag from integer power sums.
    val dir = tmpDir("r6_ccf")
    def burst(base: Long, day: Int, t: String, k: Int) =
      (1 to k).map(i => Row(base + i,
        Timestamp.valueOf(f"2024-01-0$day%d 12:00:00"), 1L, t, 1.0, "{}"))
    val rows =
      burst(100, 1, "A", 2) ++ burst(200, 2, "A", 4) ++
      burst(300, 3, "A", 6) ++ burst(400, 2, "B", 2) ++
      burst(500, 3, "B", 4) ++ burst(600, 4, "B", 6)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.crossCorr(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got === Map(
      0L -> ((4L, -0.2)), 1L -> ((3L, 1.0)),
      2L -> ((2L, 1.0)), 3L -> ((1L, 0.0))))
  }

  test("q49_mode: count ties break to the smallest value") {
    val dir = tmpDir("r6_mode")
    val rows = Seq(
      ("F", 5.0), ("F", 5.0), ("F", 3.0), ("F", 3.0), ("F", 9.0),
      ("O", 7.0), ("O", 7.0), ("O", 7.0), ("O", 1.0))
    spark.createDataFrame(rows).toDF("l_linestatus", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.q49Mode(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("F" -> ((3.0, 2L)), "O" -> ((7.0, 3L))))
  }

  test("pack_concat_chunk: straddling doc spans both sequences, " +
      "token accounting is exact") {
    // Token counts (split on ' '): doc1=3, doc2=2, doc3=4 with
    // seqLen 4: doc1 fills [0,3), doc2 spans [3,5) across the cut,
    // doc3 fills [5,9) into sequence 2's single token.
    val dir = tmpDir("r6_cc")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "w w w", "en", "s", 5L),
        Row(2L, "w w", "en", "s", 3L),
        Row(3L, "w w w w", "en", "s", 7L)), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TrainingData.concatChunk(spark, dir, seqLen = 4L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((2L, 2L, 4L)),   // doc1 whole + doc2's first token
      1L -> ((2L, 1L, 4L)),   // doc2's tail + doc3's first 3
      2L -> ((1L, 0L, 1L))))  // doc3's last token only
  }

  test("graph_assortativity: star graph is perfectly disassortative") {
    // Hub H feeds leaves L1..L3 (out-deg 3 → in-deg 1 each) and leaf
    // L1 feeds H (out-deg 1 → in-deg 1): x varies, y is constant 1
    // → zero y-variance guard yields r = 0 with num = 0.
    val dir = tmpDir("r6_ast")
    def pair(u: Long, a: String, b: String, base: Long) = Seq(
      Row(base, new Timestamp(1700000000000L), u, a, 1.0, "{}"),
      Row(base + 1, new Timestamp(1700000001000L), u, b, 1.0, "{}"))
    val rows = pair(1L, "H", "L1", 10) ++ pair(2L, "H", "L2", 20) ++
      pair(3L, "H", "L3", 30) ++ pair(4L, "L1", "H", 40)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Graph.assortativity(spark, dir).collect()(0)
    assert(r.getLong(0) === 4L)
    // x = outdeg(src) ∈ {3,3,3,1}, y = indeg(dst) = 1 everywhere:
    // y-variance is zero → guarded r = 0; numerator must also be 0.
    assert(r.getLong(1) === 0L)
    assert(r.getDouble(2) === 0.0)
  }

  test("text_rake_keywords: degree/frequency scoring favors the " +
      "long phrase") {
    // "deep learning" appears twice and "deep" also alone once:
    // freq(deep)=3, deg(deep)=2+2+1=5 → 1666666 ppm;
    // freq(learning)=2, deg=4 → 2000000 ppm; phrase score
    // 3666666 > single-word "deep" 1666666.
    val dir = tmpDir("r6_rake")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "deep learning is the deep learning", "en", "s", 35L),
        Row(2L, "deep", "en", "s", 4L)), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.rakeKeywords(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    assert(got.head === ("deep learning" -> ((2L, 3666666L))))
    assert(got.toMap === Map(
      "deep learning" -> ((2L, 3666666L)),
      "deep" -> ((1L, 1666666L))))
  }

  test("learn_ridge: Cramer solution matches an exact in-test " +
      "recompute and sits near the planted plane") {
    val dir = tmpDir("r6_ridge")
    // y = 2 + 3*x1 + 5*x2 exactly, on a 100-row integer grid
    spark.range(0, 100)
      .selectExpr("cast(id % 10 as double) as l_quantity",
        "cast(id % 7 as double) as l_discount",
        "cast(2 + 3 * (id % 10) + 5 * (id % 7) as double) " +
          "as l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.ops.Learn.ridge(spark, dir).head
    assert(r.getLong(0) === 100L)
    val (b0, b1, b2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // λ=1 shrinkage on 100 exact rows: close to, not equal to, truth
    assert(math.abs(b0 - 2.0) < 0.5 && math.abs(b1 - 3.0) < 0.2 &&
      math.abs(b2 - 5.0) < 0.2, s"betas ($b0, $b1, $b2)")
    // exact recompute of the same shared-text determinant expansion
    val xs = (0 until 100).map(i => (i % 10).toDouble)
    val zs = (0 until 100).map(i => (i % 7).toDouble)
    val ys = xs.zip(zs).map { case (a, b) => 2 + 3 * a + 5 * b }
    val n = 100.0
    val sx1 = xs.sum; val sx2 = zs.sum; val sy = ys.sum
    val sxx1 = xs.map(v => v * v).sum
    val sx12 = xs.zip(zs).map { case (a, b) => a * b }.sum
    val sxx2 = zs.map(v => v * v).sum
    val sx1y = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sx2y = zs.zip(ys).map { case (a, b) => a * b }.sum
    val det = n * ((sxx1 + 1.0) * (sxx2 + 1.0) - sx12 * sx12) -
      sx1 * (sx1 * (sxx2 + 1.0) - sx12 * sx2) +
      sx2 * (sx1 * sx12 - (sxx1 + 1.0) * sx2)
    val det1 = sy * ((sxx1 + 1.0) * (sxx2 + 1.0) - sx12 * sx12) -
      sx1 * (sx1y * (sxx2 + 1.0) - sx12 * sx2y) +
      sx2 * (sx1y * sx12 - (sxx1 + 1.0) * sx2y)
    val det2 = n * (sx1y * (sxx2 + 1.0) - sx12 * sx2y) -
      sy * (sx1 * (sxx2 + 1.0) - sx12 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)
    val det3 = n * ((sxx1 + 1.0) * sx2y - sx1y * sx12) -
      sx1 * (sx1 * sx2y - sx1y * sx2) +
      sy * (sx1 * sx12 - (sxx1 + 1.0) * sx2)
    assert(math.abs(b0 - det1 / det) < 1e-6)
    assert(math.abs(b1 - det2 / det) < 1e-6)
    assert(math.abs(b2 - det3 / det) < 1e-6)
  }

  test("eval_regression: perfect line scores zero error and R² = 1") {
    val dir = tmpDir("r6_evreg")
    spark.range(1, 101)
      .selectExpr("cast(id as double) as l_quantity",
        "cast(3 * id + 7 as double) as l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.ops.Evaluation.regressionReport(spark, dir).head
    assert(r.getLong(0) === 100L)
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L) // sae, sse
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === 1.0)
  }

  test("conv_csv_tortures: RFC-4180 round-trip is lossless on " +
      "embedded commas, quotes and newlines") {
    val out = graft.ops.ParityQueries.convCsvTortures(spark, sf).head
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.getLong(0) === nDocs)
    assert(out.getLong(1) === 0L, "round-trip mismatches")
    assert(out.getLong(3) >= nDocs, "embedded newlines lost")
  }

  test("dq_mutual_info: independent grid scores zero, MI bounded by " +
      "H(type)") {
    // 2 types × 2 hours with perfectly proportional counts:
    // independence ⇒ every cell's ln-ratio is exactly ln(1) = 0.
    val dir = tmpDir("r6_mi")
    def at(h: Int, t: String, k: Int, base: Long) =
      (1 to k).map(i => Row(base + i,
        Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), 1L, t, 1.0, "{}"))
    val rows = at(1, "A", 2, 100) ++ at(2, "A", 4, 200) ++
      at(1, "B", 3, 300) ++ at(2, "B", 6, 400)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.DataQuality.dqMutualInfo(spark, dir).head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 0L, s"independent grid MI ${r.getLong(1)}")
    // real corpus: 0 ≤ MI ≤ H(type)
    val c = graft.ops.DataQuality.dqMutualInfo(spark, sf).head
    assert(c.getDouble(2) >= 0.0 && c.getDouble(2) <= c.getDouble(3))
  }

  test("graph_ppr: teleport mass concentrates at the seed, total " +
      "mass conserved within rounding") {
    val out = Graph.ppr(spark, sf).collect()
    val seed = out.map(_.getString(0)).min
    val r = out.map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.values.forall(_ >= 0L))
    // the seed holds at least its own 0.15 teleport share
    assert(r(seed) >= 150000000000L)
    // integer floors only ever LOSE mass: total ≤ 10^12 + slack 0
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.sum > 500000000000L, "mass collapsed — wrong seed?")
  }

  test("sim_matryoshka_recall: full dimension recalls itself " +
      "perfectly, recall never exceeds 1") {
    val rows = graft.ops.Similarity.matryoshkaRecall(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(64L) === ((80L, 1000000L)))
    rows.values.foreach { case (h, ppm) =>
      assert(h <= 80L && ppm <= 1000000L)
    }
  }

  test("graph_ktruss: matches an exact in-test fixpoint recompute " +
      "over the same pair graph") {
    val base = graft.ops.Dedup.ngramJaccard(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference recompute: peel edges with support < 1 to fixpoint
    def trussOf(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      var e = edges
      var changed = true
      while (changed) {
        val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val sup = e.map { case (a, b) =>
          (a, b) -> adj.getOrElse(a, Set.empty[Long])
            .intersect(adj.getOrElse(b, Set.empty[Long])).size.toLong
        }.toMap
        val kept = sup.filter(_._2 >= 1L).keySet
        changed = kept != e
        e = kept
        if (!changed) return sup.filter(_._2 >= 1L)
      }
      Map.empty
    }
    val exp = trussOf(base)
    val got = Graph.kTruss(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === exp)
    assert(got.nonEmpty, "mutant groups should close triangles")
  }

  test("ts_peaks: planted series flags interior strict maxima with " +
      "exact prominence") {
    val dir = tmpDir("r6_peaks")
    // type A daily counts [1,3,2,5,1] on Jan 1-5: peaks at day 2
    // (prominence 3-2=1) and day 4 (prominence 5-2=3).
    def day(d: Int, k: Int, base: Long) =
      (1 to k).map(i => Row(base + i,
        Timestamp.valueOf(f"2024-01-0$d%d 12:00:00"), 1L, "A", 1.0, "{}"))
    val rows = day(1, 1, 100) ++ day(2, 3, 200) ++ day(3, 2, 300) ++
      day(4, 5, 400) ++ day(5, 1, 500)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.tsPeaks(spark, dir).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("2024-01-02", 3L, 1L),
      ("2024-01-04", 5L, 3L)))
  }

  test("eval_youden: planted separable scores recover the exact " +
      "cut point") {
    // en docs at n_chars {100, 90}, others at {10, 20}: threshold 90
    // separates perfectly → J = 1, tp = 2, fp = 0.
    val dir = tmpDir("r6_youden")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(Row(1L, "a", "en", "s", 100L),
      Row(2L, "a", "en", "s", 90L), Row(3L, "a", "fr", "s", 10L),
      Row(4L, "a", "de", "s", 20L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Evaluation.youdenGate(spark, dir).head
    assert(r.getLong(0) === 90L)   // threshold
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L)
    assert(r.getDouble(6) === 1.0)
  }

  test("link_blocking_metrics: exact-cover blocking retains every " +
      "true pair") {
    val r = graft.ops.Linkage.blockingMetrics(spark, sf).head
    val (nd, nc, ncand, ntrue) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nd === nc)
    assert(ntrue === nd, "omission passes must cover every mutation")
    assert(r.getLong(5) === 1000000L) // completeness ppm
    assert(ncand < nd * nc, "blocking must beat the cross join")
    assert(r.getLong(4) > 0L)
  }

  test("conv_parquet_zstd: codec round-trip preserves per-source " +
      "fingerprints") {
    val got = graft.ops.ParityQueries.convParquetZstd(spark, sf)
      .collect()
    val exp = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    got.foreach { r =>
      assert(exp(r.getString(0)) === ((r.getLong(1), r.getLong(2))))
    }
    assert(got.nonEmpty)
  }

  test("sim_knn_graph: mutual edges are symmetric and subset the " +
      "directed lists") {
    val rows = graft.ops.Similarity.knnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 5L)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
    // mutuality strictly filters: fewer mutual edges than directed
    val nDirected = 5L * spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 100).count()
    assert(rows.length < nDirected)
  }

  test("embed_triplets: margins reconcile with the snapped " +
      "similarities and anchors are complete") {
    val rows = graft.ops.Similarity.tripletMine(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).toSeq.sorted)
    rows.foreach { r =>
      assert(r.getLong(5) === r.getLong(3) - r.getLong(4))
      assert(r.getLong(1) !== r.getLong(0))
      assert(r.getLong(2) !== r.getLong(0))
    }
    assert(rows.nonEmpty)
  }

  test("eval_gains_table: deciles partition the corpus and capture " +
      "is monotone to 100%") {
    val rows = graft.ops.Evaluation.gainsTable(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === total)
    val captures = rows.map(_.getLong(4))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b })
    assert(captures.last === 1000000L)
    assert(rows.map(_.getLong(0)).toSeq === rows.map(_.getLong(0))
      .toSeq.sorted)
  }

  test("purge_cascade: on-disk cascade leaves zero orphans and " +
      "consistent survivor counts") {
    val r = graft.ops.ParityQueries.purgeCascade(spark, sf).head
    val custAll = spark.read.parquet(s"$sf/customer.parquet")
    val doomed = custAll.filter(col("c_acctbal") < 0.0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(doomed.nonEmpty, "fixture must delete someone")
    assert(r.getLong(0) === custAll.count() - doomed.size)
    assert(r.getLong(3) === 0L && r.getLong(4) === 0L)
    val ordersAll = spark.read.parquet(s"$sf/orders.parquet")
    val expOrders = ordersAll
      .filter(!col("o_custkey").isin(doomed.toSeq: _*)).count()
    assert(r.getLong(1) === expOrders)
  }

  test("eval_mcc: planted confusion matrix yields MCC = 1/3") {
    val dir = tmpDir("r6_mcc")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // tp=2 (en long), fn=1 (en short), fp=1 (fr long), tn=2 (fr short)
    val rows = Seq(
      Row(1L, "a", "en", "s", 3000L), Row(2L, "a", "en", "s", 2000L),
      Row(3L, "a", "en", "s", 100L), Row(4L, "a", "fr", "s", 2500L),
      Row(5L, "a", "fr", "s", 50L), Row(6L, "a", "fr", "s", 60L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Evaluation.mccGate(spark, dir).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 1L, 1L, 2L)))
    assert(r.getLong(4) === 3L)
    assert(math.abs(r.getDouble(5) - 1.0 / 3.0) < 1e-15)
  }

  test("purge_audit_chain: recursive md5 chain matches a local " +
      "re-derivation and breaks on tampering") {
    import java.security.MessageDigest
    def md5(x: String): String =
      MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ledger = spark.read.parquet(s"$sf/orders.parquet")
      .orderBy(col("o_orderkey")).limit(64)
      .select(col("o_orderkey"), col("o_orderstatus")).collect()
    var h = md5("genesis")
    val exp = scala.collection.mutable.ArrayBuffer(0L -> h)
    ledger.zipWithIndex.foreach { case (r, i) =>
      h = md5(s"$h|${r.getLong(0)}|${r.getString(1)}")
      exp += (i + 1L) -> h
    }
    val got = graft.ops.ParityQueries.purgeAuditChain(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq === exp.toSeq)
    // tamper check: flipping entry 1's payload changes every later h
    val tampered = md5(s"${exp(0)._2}|999999|X")
    assert(tampered !== exp(1)._2)
  }

  test("text_boilerplate_strip: planted banner gram is removed from " +
      "every host document") {
    val dir = tmpDir("r6_boiler")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // "accept all cookies" (18 chars) leads 6 of 8 docs — by far the
    // top-df 3-gram; remaining docs share no repeated 3-gram.
    val rows = (1L to 6L).map(i =>
      Row(i, s"accept all cookies real body $i", "en", "s", 30L)) ++
      Seq(Row(7L, "uniq seven words here", "en", "s", 21L),
        Row(8L, "other eight tokens now", "en", "s", 22L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.boilerplateStrip(spark, dir, 1)
      .collect()(0)
    assert(got.getLong(1) === 8L)
    // each of the 6 banner docs loses exactly the 18-char gram
    assert(got.getLong(4) === 6L * 18L,
      s"removed ${got.getLong(4)}")
  }

  test("conv_csv_latin1: declared-charset round-trip is lossless on " +
      "non-ASCII bytes") {
    val out = graft.ops.ParityQueries.convCsvLatin1(spark, sf).head
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.getLong(0) === nDocs)
    assert(out.getLong(1) === 0L, "mojibake detected")
  }

  test("embed_norm_stats: integer ledgers reconcile and anisotropy " +
      "is a valid ratio") {
    val r = graft.ops.Similarity.normStats(spark, sf).head
    val n = r.getLong(0)
    assert(n === spark.read.parquet(s"$sf/embeddings.parquet").count())
    val meanNorm = r.getDouble(3)
    val normOfMean = r.getDouble(4)
    // triangle inequality: ||mean of v|| <= mean of ||v|| (+snap slack)
    assert(normOfMean <= meanNorm + 1e-5,
      s"$normOfMean vs $meanNorm")
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000001L)
    assert(math.abs(meanNorm -
      r.getLong(1).toDouble / 1e6 / n) < 1e-12)
  }

  test("curate_ab_srm: arms partition each source and a planted " +
      "balanced split passes") {
    val rows = graft.ops.TrainingData.abSrm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3))
      val expected = {
        val d = r.getLong(2) - r.getLong(3)
        d * d * 1000000L / r.getLong(1)
      }
      assert(r.getLong(4) === expected)
      assert(r.getLong(5) === (if (expected > 3841000L) 1L else 0L))
    }
  }

  test("dedup_cluster_sizes: histogram reconciles with the " +
      "components frame") {
    val comp = graft.ops.Dedup.components(spark, sf).collect()
      .map(_.getLong(1))
    val expected = comp.groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, cs) => sz -> cs.size.toLong }
    val got = graft.ops.Dedup.clusterSizes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    val totalDocs = graft.ops.Dedup.clusterSizes(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(totalDocs === comp.length.toLong)
  }

  test("text_vocab_growth: monotone curves ending at exact corpus " +
      "totals") {
    val rows = graft.ops.TextAnalysis.vocabGrowth(spark, sf).collect()
    assert(rows.length === 10)
    Seq(1, 2, 3).foreach { c =>
      val v = rows.map(_.getLong(c))
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"col $c")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.last.getLong(1) === docs.count())
    val vocab = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .distinct().count()
    assert(rows.last.getLong(3) === vocab)
  }

  test("ts_burstiness: constant series is sub-Poisson, planted " +
      "burst inflates the Fano factor") {
    val dir = tmpDir("r6_fano")
    def day(d: Int, t: String, k: Int, base: Long) =
      (1 to k).map(i => Row(base + i,
        Timestamp.valueOf(f"2024-01-0$d%d 12:00:00"), 1L, t, 1.0, "{}"))
    // A: 5,5,5 per day (zero variance); B: 1,1,10 (bursty)
    val rows = (1 to 3).flatMap(d => day(d, "A", 5, d * 1000L)) ++
      day(1, "B", 1, 10000) ++ day(2, "B", 1, 20000) ++
      day(3, "B", 10, 30000)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.TimeSeries.tsBurstiness(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("A") === 0.0)
    // B: n=3, sx=12, sxx=102 → (306-144)/36 = 4.5
    assert(got("B") === 4.5)
  }

  test("text_ttr: repetitive doc scores exactly its distinct ratio") {
    val dir = tmpDir("r6_ttr")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "a a a a", "en", "s", 7L),       // ttr = 1/4
      Row(2L, "w x y z", "en", "s", 7L))       // ttr = 1
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.TextAnalysis.textTtr(spark, dir).head
    assert(r.getLong(1) === 2L && r.getLong(2) === 8L)
    assert(r.getLong(3) === (250000L + 1000000L) / 2L)
  }

  test("ts_interpolate: planted gap gets the exact straight line, " +
      "edges stay unfilled") {
    val dir = tmpDir("r6_interp")
    // user 1: v=2 at 01:00, v=8 at 04:00 → 03 missing hours 02,03
    // interpolate to 4 and 6; hours before 01 and after 04 stay null.
    val rows = Seq(
      Row(1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "A", 2.0, "{}"),
      Row(2L, Timestamp.valueOf("2024-01-01 04:00:00"), 1L, "A", 8.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.TimeSeries.tsInterpolate(spark, dir).head
    assert(r.getLong(1) === 2L)      // n_obs
    assert(r.getLong(2) === 2L)      // n_interp: 02:00 and 03:00 only
    // sum = 2 + 4 + 6 + 8 = 20 exactly, in 1e-6 units
    assert(r.getLong(3) === 20000000L)
  }

  test("conv_jsonl_nested: nest → parse → unnest is lossless vs the " +
      "relational rollup") {
    val got = graft.ops.ParityQueries.convJsonlNested(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val exp = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("p"),
        sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("q"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === exp)
  }

  test("graph_walks: walks follow real edges, absorb at dead ends, " +
      "and are reproducible") {
    val dir = tmpDir("r6_walks")
    // A->B, B->C; C is a dead end (absorbs)
    val rows = Seq(
      Row(1L, new Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      Row(2L, new Timestamp(1700000001000L), 1L, "B", 1.0, "{}"),
      Row(3L, new Timestamp(1700000002000L), 1L, "C", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.walks(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // single out-edges make every walk deterministic regardless of
    // the hash: A -> B -> C then absorb
    (0L to 1L).foreach { w =>
      assert(got(("A", w)) === "A B C C C")
      assert(got(("B", w)) === "B C C C C")
      assert(got(("C", w)) === "C C C C C")
    }
    val again = Graph.walks(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(again === got)
  }

  test("graph_clustering_coeff: ledgers reconcile with triangles " +
      "and degrees, coefficients bounded") {
    val rows = Graph.clusteringCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri, local) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (deg >= 2)
        assert(local === 2L * tri * 1000000L / (deg * (deg - 1L)))
      else assert(local === 0L)
      assert(local <= 1000000L && r.getLong(4) <= 1000000L)
    }
    // global transitivity is one value repeated on every row
    assert(rows.map(_.getLong(4)).distinct.length === 1)
  }

  test("eval_spearman: perfectly monotone fixture scores rho = 1, " +
      "corpus rho is a valid correlation") {
    val dir = tmpDir("r6_rho")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // token counts 1..4 strictly increase with n_chars 10..40
    val rows = (1 to 4).map(i =>
      Row(i.toLong, Seq.fill(i)("w").mkString(" "), "en", "s",
        i * 10L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.Evaluation.spearmanGate(spark, dir).head
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12)
    val c = graft.ops.Evaluation.spearmanGate(spark, sf).head
    assert(c.getDouble(6) >= -1.0 && c.getDouble(6) <= 1.0)
  }

  test("q51_percentile_disc: planted values hit exact data points") {
    val dir = tmpDir("r6_pdisc")
    // 'F': qty 1..10 → p25 = 3 (ceil(2.5)), p50 = 5, p75 = 8
    // (ceil(7.5)), p95 = 10 (ceil(9.5))
    val rows = (1 to 10).map(i => ("F", i.toDouble))
    spark.createDataFrame(rows).toDF("l_linestatus", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.q51PercentileDisc(spark, dir).head
    assert(r.getLong(1) === 10L)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)) === ((3.0, 5.0, 8.0, 10.0)))
  }

  test("dq_iqr_outliers: planted spike breaches the upper Tukey " +
      "fence only") {
    val dir = tmpDir("r6_iqr")
    // values 1..8 plus one 100.0 spike: q1=3 (ceil(2.25)=3rd),
    // q3=7 (ceil(6.75)=7th), iqr=4, hi=7+6=13, lo=3-6=-3 → exactly
    // one high breach, zero low.
    val rows = ((1 to 8).map(i =>
      Row(i.toLong, new Timestamp(1700000000000L + i), 1L, "A",
        i.toDouble, "{}")) :+
      Row(9L, new Timestamp(1700000009000L), 1L, "A", 100.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.DataQuality.dqIqr(spark, dir).head
    assert(r.getLong(1) === 9L)
    assert(r.getLong(2) === 30000L && r.getLong(3) === 70000L)
    assert(r.getLong(4) === 0L && r.getLong(5) === 1L)
  }

  test("purge_soft_delete: logical mask and physical apply agree " +
      "on the visible ledger") {
    val r = graft.ops.ParityQueries.purgeSoftDelete(spark, sf).head
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.getLong(0) === total)
    assert(r.getLong(1) > 0L, "fixture must delete someone")
    assert(r.getLong(2) === total - r.getLong(1))
    assert(r.getLong(2) === r.getLong(4), "logical != physical rows")
    assert(r.getLong(3) === r.getLong(5), "logical != physical chars")
  }

  test("graph_powerlaw_alpha: in-test MLE recompute matches, alpha " +
      "exceeds 1") {
    val r = Graph.powerlawAlpha(spark, sf).head
    val (n, sumLn, alpha) = (r.getLong(0), r.getLong(2), r.getLong(3))
    assert(alpha > 1000000L)
    assert(alpha === 1000000L + n * 1000000000000000L / sumLn)
    // recompute sum of snapped ln(2d) terms from the degree frame
    val deg = graft.ops.Dedup.ngramJaccard(spark, sf)
      .select(explode(array(col("id_a"), col("id_b"))).as("n"))
      .groupBy(col("n")).count().collect().map(_.getLong(1))
    val expSum = deg.map(d =>
      math.floor(math.log(2.0 * d) * 1e9 + 0.5).toLong).sum
    assert(sumLn === expSum)
    assert(n === deg.length.toLong)
  }

  test("maint_ivm_join: incremental result equals full recompute") {
    val inc = Maintenance.ivmJoin(spark, sf)
    val full = {
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_custkey"), c("c_name"),
          c("c_mktsegment"), o("o_totalprice"))
    }
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }
}
