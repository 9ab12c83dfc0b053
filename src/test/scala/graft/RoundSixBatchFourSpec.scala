package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Learn, ParityQueries, Similarity, TimeSeries}

/** Planted-fixture invariants for the fourth round-6 operator batch:
  * Theil–Sen robust trend, one-way ANOVA F feature screen, exact
  * ball-pruned cosine range search, and the dictionary-encoding
  * layout audit. */
class RoundSixBatchFourSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  test("ts_theil_sen: hand-enumerated pairwise slopes and the " +
    "discrete lower median") {
    // Monthly revenue (cents): Jan 10000, Feb 20000, Mar 15000,
    // Apr 40000. Pair slopes (ppm): (1,2) 1e10, (1,3) 2.5e9,
    // (1,4) 1e10, (2,3) -5e9, (2,4) 1e10, (3,4) 2.5e10.
    // Sorted: -5e9, 2.5e9, 1e10, 1e10, 1e10, 2.5e10; n=6,
    // lower median = rank (6+1) div 2 = 3 -> 1e10; positives = 5.
    val dir = tmpDir("r6b4_theil")
    val months = Seq( // 15th of Jan..Apr 1995, UTC epoch millis
      790128000000L -> 100.0, 792806400000L -> 200.0,
      795225600000L -> 150.0, 797904000000L -> 400.0)
    val data = months.zipWithIndex.map { case ((ts, price), i) =>
      Row(i.toLong + 1, 1L, "F", price, new Timestamp(ts), "1-URGENT")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = TimeSeries.theilSen(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((6L, 5L, 10000000000L)))
  }

  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  test("learn_anova_f: hand-computed F over planted class means") {
    // qty per class: A {1,3}, N {5,7}, R {9,11}.
    // S_g = 4,12,20; Q = 10+74+202 = 286; S = 36, n = 6.
    // SSB = (8+72+200) - 216 = 64; SSW = 286 - 280 = 6.
    // F = (64/2)/(6/3) = 16 -> f_ppm = 16_000_000.
    val dir = tmpDir("r6b4_anova")
    val qty = Seq(1.0 -> "A", 3.0 -> "A", 5.0 -> "N", 7.0 -> "N",
      9.0 -> "R", 11.0 -> "R")
    val data = qty.zipWithIndex.map { case ((q, f), i) =>
      // other features get within-class variance so no F is 0/0
      Row(i.toLong + 1, 1L, 1L, 1, q, (i + 1) * 1.0,
        i * 0.01, i * 0.01, f, "O", new Timestamp(0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), lineitemSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Learn.anovaF(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("qty") === ((6L, 16000000L)))
    assert(got.size === 4 && got.values.forall(_._1 == 6L))
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("sim_range_search: exact matches with the ball prune " +
    "provably biting on a clustered fixture") {
    // Queries q0=(1,0), q1=(0,1) (each also gains a +10000 perturbed
    // copy via withNearDuplicates: p0=(1.01,0), p1=(0.01,1)).
    // Targets: t100=(2,0), t101=(1,1), t102=(-1,0.1), t103=(.5,-.5),
    // plus a 20-point decoy cluster near (-1,-1) whose cells must be
    // pruned (cos to both queries ~ -0.707, far outside tau=0.4).
    val dir = tmpDir("r6b4_range")
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val pts = Seq(
      Row(0L, v(1, 0), 0), Row(1L, v(0, 1), 0),
      Row(100L, v(2, 0), 1), Row(101L, v(1, 1), 1),
      Row(102L, v(-1, 0.1), 1), Row(103L, v(0.5, -0.5), 1)) ++
      (0 until 20).map(i =>
        Row(200L + i, v(-1 - i * 0.001, -1 + i * 0.001), 2))
    spark.createDataFrame(
      spark.sparkContext.parallelize(pts, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cos(q0,·) >= 0.4: t100 (1.0), t101 (.707), t103 (.707),
    //   p0 (~1.0), q1? cos=0 no, p1 (~.01) no.
    // cos(q1,·) >= 0.4: t101 (.707), p1 (~1.0), p0 no, t102 (.0995) no.
    assert(got === Set((0L, 100L), (0L, 101L), (0L, 103L),
      (0L, 10000L), (1L, 101L), (1L, 10001L)))
    // The decoy cluster's cells are never probed: with 26 corpus
    // points over 16 cells, an unpruned probe set would be ~2*16;
    // the prune must cut it well below queries x cells.
    val probes = Similarity.rangeSearchProbes(spark, dir)
    assert(probes < 20, s"ball prune did not bite: $probes probes")
  }

  test("conv_dict_encoding: low-cardinality column stays dictionary-" +
    "encoded, high-entropy column falls back to plain") {
    val dir = tmpDir("r6b4_dict")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    // 50 distinct ~200-char texts -> ~10 KB of dictionary candidates
    // against the 4 KiB dictionary page budget -> PLAIN fallback;
    // lang has 2 distinct values -> stays dictionary-encoded.
    val rows = (0 until 50).map { i =>
      val t = s"document number $i body " * 10 + i
      Row(i.toLong, t, if (i % 2 == 0) "en" else "de", "s", t.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ParityQueries.convDictEncoding(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got("lang") === ((50L, true, false)))
    assert(got("text") === ((50L, false, true)))
  }
}
