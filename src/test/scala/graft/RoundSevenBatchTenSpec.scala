package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Graph, TimeSeries, TrainingData}

/** Planted-fixture invariants for the tenth round-7 operator batch:
  * forecast metrics, seasonal strength, Adamic–Adar, loss masking. */
class RoundSevenBatchTenSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("ts_forecast_metrics: level shift against the week-ago naive") {
    val dir = tmpDir("r7b10_fm")
    val rows = (1 to 14).map { d =>
      Row(d.toLong, 1L, "F", if (d <= 7) 100.0 else 110.0,
        Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = TimeSeries.tsForecastMetrics(spark, dir).head
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 1000L, "MAE = 10.00 per day in cents")
    assert(r.getLong(2) == 7L * 1000L * 1000000L / (7L * 11000L))
    val sm9 = math.floor(
      2.0 * 1000.0 / 21000.0 * 1e9 + 0.5).toLong
    val smape = math.floor(sm9 * 7.0 / 7.0 / 1e9 * 1e6 + 0.5).toLong
    assert(r.getLong(3) == smape, s"smape ${r.getLong(3)} != $smape")
  }

  test("ts_seasonal_strength: pure-diurnal 1e6, no-structure 0") {
    val dir = tmpDir("r7b10_ss")
    // 'diurnal': hod 0 always 2 events, hod 12 always 4 (2 days)
    // 'flat': hod means equal across hods but day-level variance
    def ev(id: Long, d: Int, h: Int, t: String) =
      Row(id, Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00"),
        id, t, 0.0, "{}")
    var id = 0L
    def burst(d: Int, h: Int, n: Int, t: String) = (1 to n).map { _ =>
      id += 1; ev(id, d, h, t)
    }
    val rows =
      burst(1, 0, 2, "diurnal") ++ burst(1, 12, 4, "diurnal") ++
      burst(2, 0, 2, "diurnal") ++ burst(2, 12, 4, "diurnal") ++
      burst(1, 0, 1, "flat") ++ burst(1, 12, 3, "flat") ++
      burst(2, 0, 3, "flat") ++ burst(2, 12, 1, "flat")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.tsSeasonalStrength(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("diurnal") == 1000000L, s"diurnal ${got("diurnal")}")
    assert(got("flat") == 0L, s"flat ${got("flat")}")
  }

  test("graph_adamic_adar: candidates are non-adjacent, scored descending") {
    val rows = Graph.adamicAdar(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 30)
    val scores = rows.map(_._4)
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "descending")
    rows.foreach { case (a, b, cn, aa) =>
      assert(cn >= 1 && aa > 0)
      // construction: edges are (i, i+1) with i%8≠7 and (i, i+2)
      // with i even — emitted predictions must be NON-edges
      val isChain = b == a + 1 && a % 8 != 7
      val isSkip = b == a + 2 && a % 2 == 0
      assert(!isChain && !isSkip, s"($a,$b) is an existing edge")
    }
  }

  test("pack_loss_mask: assistant tokens carry the loss, prompt masked") {
    val dir = tmpDir("r7b10_lm")
    val rows = Seq(
      (0L, "s s"), (1L, "u u u"), (2L, "a a a a"),
      (3L, "s"), (4L, "u u"), (5L, "a")).map { case (id, t) =>
      Row(id, t, "en", "s0", t.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.lossMask(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((3L, 5L, 4L, 4000000L / 9L)))
    assert(got(1L) == ((3L, 3L, 1L, 1000000L / 4L)))
  }
}
