package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, LanguageModel, TextAnalysis, TimeSeries}

/** Planted-fixture invariants for the second round-7 operator batch:
  * TextRank keywords, held-out LM perplexity, HLL error audit, the
  * Kalman local-level filter, and the Granger-causality screen. */
class RoundSevenBatchTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  test("text_textrank: the co-occurrence hub outranks its spokes") {
    val dir = tmpDir("r7b2_tr")
    // alpha—beta (w=2), alpha—gamma (w=1): alpha is the hub; short
    // tokens ("of") are dropped by the ≥4-char filter.
    val rows = Seq(
      Row(1L, "alpha beta alpha gamma", "en", "s0", 22L),
      Row(2L, "of of of", "en", "s0", 8L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.textRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSet == Set("alpha", "beta", "gamma"))
    assert(got.head._1 == "alpha", s"hub should rank first: ${got.toSeq}")
    val byWord = got.toMap
    assert(byWord("beta") > byWord("gamma"),
      "the heavier spoke outranks the lighter one")
    // damped rank mass stays near the simplex (integer floors only lose)
    assert(got.map(_._2).sum <= 1000000000000L)
    assert(got.map(_._2).sum > 900000000000L)
  }

  test("text_lm_perplexity: held-out split accounting and positive NLL") {
    val r = LanguageModel.lmPerplexity(spark, sf).head
    val total = graft.Tables.documents(spark, sf).count()
    val (nTrain, nVal) = (r.getLong(0), r.getLong(1))
    assert(nTrain + nVal <= total)
    assert(nTrain > nVal, "80/10 buckets")
    assert(r.getLong(2) > 0, "val bigrams exist")
    // add-one smoothing keeps every bigram probability < 1 → NLL > 0
    assert(r.getLong(3) > 0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 20.0)
  }

  test("dq_hll_error: estimates within bound, exact counts exact") {
    val got = DataQuality.hllError(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got.size == 4)
    got.values.foreach { case (_, ok) => assert(ok) }
    assert(got("events.user_id")._1 ==
      graft.Tables.events(spark, sf)
        .select("user_id").distinct().count())
  }

  test("ts_kalman: hand-folded gain/level/variance recurrence") {
    val dir = tmpDir("r7b2_kal")
    val rows = Seq(
      (1L, "2024-01-01", 100.0), (2L, "2024-01-02", 110.0),
      (3L, "2024-01-03", 120.0)).map { case (k, d, v) =>
      Row(k, 1L, "F", v, Timestamp.valueOf(s"$d 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def r6(x: Double): Double = {
      val y = x * 1e6
      (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
    }
    var (l, p) = (100.0, 1.0)
    val expect = Seq((1L, l, 0.0, p)) ++ Seq(110.0, 120.0).zipWithIndex
      .map { case (y, i) =>
        val pp = p + 0.5
        val k = r6(pp / (pp + 2.0))
        l = r6(l + k * (y - l)); p = r6((1.0 - k) * pp)
        ((i + 2).toLong, l, k, p)
      }
    val got = TimeSeries.tsKalman(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expect, s"got $got expected $expect")
  }

  test("ts_granger: a planted lag-1 driver is detected") {
    val dir = tmpDir("r7b2_gr")
    // purchase value on day t = click value on day t-1 (+ wiggle), so
    // the cross-lag coefficient must sit near 1 and F must be large.
    val clicks = Seq(5.0, 9.0, 4.0, 8.0, 2.0, 7.0, 6.0, 3.0)
    val wiggle = Seq(0.0, 0.1, -0.2, 0.15, -0.1, 0.05, -0.05, 0.2)
    val rows = clicks.zipWithIndex.flatMap { case (c, i) =>
      val day = f"2024-01-${i + 1}%02d"
      val click = Row((2 * i + 1).toLong,
        Timestamp.valueOf(s"$day 10:00:00"), 1L, "click", c, "{}")
      val prev = if (i == 0) None else Some(
        Row((2 * i + 2).toLong, Timestamp.valueOf(s"$day 11:00:00"),
          1L, "purchase", clicks(i - 1) + wiggle(i), "{}"))
      Seq(click) ++ prev
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TimeSeries.tsGranger(spark, dir).head
    assert(r.getLong(0) == 7L) // 8 days, first has no lag
    val betaCross = r.getLong(2)
    assert(math.abs(betaCross - 1000000L) < 150000L,
      s"cross beta $betaCross should be near 1e6")
    assert(r.getLong(4) < r.getLong(3),
      "unrestricted RSS below restricted")
    assert(r.getLong(5) > 1000000L, "F clears 1.0")
  }
}
