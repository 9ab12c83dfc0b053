package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, ParityQueries, TimeSeries}

/** Planted-fixture invariants for the twelfth round-6 operator
  * batch: Holt–Winters seasonal smoothing, corpus BLEU-2, and GDPR
  * rectification. */
class RoundSixBatchTwelveSpec extends SparkSpec {

  test("ts_holt_winters: a perfectly periodic series locks level and " +
    "trend, forecasts replay the season") {
    val dir = tmpDir("r6b12_hw")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val day0 = 788918400000L // 1995-01-01 UTC
    // y = 110..170 repeating weekly, 15 days -> l=140, b=0 forever
    val rows = (0 until 15).map { i =>
      Row(i.toLong + 1, 1L, "F", 110.0 + (i % 7) * 10.0,
        new Timestamp(day0 + i.toLong * 86400000L), "1")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TimeSeries.tsHoltWinters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // last seasonals are for days 9..15: -20,-10,0,10,20,30,-30
    val seas = Seq(-20.0, -10.0, 0.0, 10.0, 20.0, 30.0, -30.0)
    assert(got.toSeq === (1 to 7).map(h =>
      (h.toLong, 140.0, 0.0, seas(h - 1), 140.0 + seas(h - 1))))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("eval_bleu_pairs: clipped precisions, no brevity penalty at " +
    "equal length, geometric mean exact") {
    val dir = tmpDir("r6b12_bleu")
    val rows = Seq(
      Row(1L, "x y z", "en", "a", 5L),
      Row(2L, "x y w", "en", "a", 5L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Evaluation.bleuPairs(spark, dir).collect().head
    // p1 = 2/3, p2 = 1/2, BP = 1 -> sqrt(1/3) -> 577350 ppm floored
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((1L, 3L, 3L, 2L, 1L, 577350L)))
  }

  test("purge_rectify: subjects rewritten on disk, non-subject " +
    "checksum untouched") {
    val dir = tmpDir("r6b12_rect")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val rows = Seq(96L, 97L, 98L, 194L).map(k =>
      Row(k, s"c$k", 0, 10.0, "AUTO"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = ParityQueries.purgeRectify(spark, dir).collect().head
    // 97 and 194 are subjects; 96/98 keep 1000 cents each
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((4L, 4L, 2L, 0L, 2000L)))
  }
}
