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

  test("ewma: first full-history row matches a sequential snapped fold") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .collect()
    val u0 = ev.head.getLong(0)
    val series = ev.filter(_.getLong(0) == u0)
    assert(series.length >= 8, "fixture user needs 8 events")
    val w9 = (0 until 8).map(i =>
      math.floor(0.3 * math.pow(0.7, i) * 1e9 + 0.5).toLong)
    // EWMA at the 8th event: lags 0..7 reach back to the first event.
    val window = (0 until 8).map(i => series(7 - i).getDouble(3))
    val t9 = window.zip(w9).map { case (v, w) =>
      math.floor(v * w + 0.5).toLong }.sum
    val expect = t9.toDouble / w9.sum.toDouble
    val got = ops.TimeSeries.ewma(spark, sf)
      .filter(col("user_id") === u0)
      .orderBy(col("event_id")).head()
    assert(got.getLong(1) == series(7).getLong(1))
    assert(got.getDouble(2) == expect)
  }

  test("kCore: cascading peel removes a whole path, triangle survives") {
    import spark.implicits._
    // Triangle 1-2-3 plus path 10-11-12-13 attached to nothing.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("id_a", "id_b")
    val out = ops.Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Path ends have degree 1 -> peel; interior degrades -> cascade.
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("logregSteps: step-1 intercept equals snapped mean(y) - 0.5") {
    import org.apache.spark.sql.functions.{col, when, lit}
    val docs = Tables.documents(spark, sf)
      .select(when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .collect().map(_.getDouble(0))
    val n = docs.length
    val g0 = docs.map(y => math.floor((0.5 - y) * 1e9 + 0.5).toLong).sum
    val expectB0 = -(g0.toDouble / (n.toDouble * 1e9))
    val rows = ops.Learn.logregSteps(spark, sf).collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == expectB0)
    // Step 2 must actually move the weights.
    assert(rows(1).getDouble(1) != rows(0).getDouble(1))
    rows.foreach { r =>
      (1 to 3).foreach(i => assert(!r.getDouble(i).isNaN))
    }
  }

  test("hammingJoin: exact at the k boundary, distance k+1 excluded") {
    import spark.implicits._
    val base = 0x123456789ABCL
    // Distances from base: 1, 3 (kept at k=3) and 4 (excluded).
    val sigs = Seq(
      (1L, base),
      (2L, base ^ 1L),                     // d=1
      (3L, base ^ ((1L << 63) | (1L << 20) | 2L)), // d=3, bits in 3 bands
      (4L, base ^ 0xF0L)                   // d=4
    ).toDF("id", "sig")
    val got = ops.Dedup.hammingJoin(sigs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      a <- sigs.collect(); b <- sigs.collect()
      if a.getLong(0) < b.getLong(0)
      d = java.lang.Long.bitCount(a.getLong(1) ^ b.getLong(1))
      if d <= 3
    } yield (a.getLong(0), b.getLong(0), d.toLong)).toSet
    assert(got == brute)
    assert(got.contains((1L, 3L, 3L)) && !got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("lshScurve: monotone in s, 16x2 dominates 8x4 at low similarity") {
    val rows = ops.Dedup.lshScurve(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getDouble(2)), r.getDouble(3))).toMap
    Seq(8L, 16L).foreach { bands =>
      (2 to 19).foreach { i =>
        assert(rows((bands, i / 20.0)) >= rows((bands, (i - 1) / 20.0)))
      }
    }
    // 16 bands x 2 rows catches mid-similarity pairs 8x4 misses.
    assert(rows((16L, 0.5)) > rows((8L, 0.5)))
  }

  test("gzip roundtrip: the export really is gzip files, and re-reads") {
    val out = ops.ParityQueries.convCsvGzipRoundtrip(spark, sf).collect()
    assert(out.nonEmpty)
    val dir = new java.io.File(
      s"${graft.Scaffold.scratchBase}/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/conv_roundtrip_csv_gz")
    val gz = dir.listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(gz.nonEmpty, s"no .csv.gz files in $dir")
    // row total survives the codec round-trip
    assert(out.map(_.getLong(1)).sum ==
      Tables.lineitem(spark, sf).count())
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
