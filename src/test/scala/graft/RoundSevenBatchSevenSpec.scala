package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, TimeSeries, TrainingData}

/** Planted-fixture invariants for the seventh round-7 operator batch:
  * Mann–Kendall trend, attention-mask waste, GRPO advantages, and
  * per-slice AUC. */
class RoundSevenBatchSevenSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("ts_mann_kendall: a strictly rising series scores S = n(n-1)/2") {
    val dir = tmpDir("r7b7_mk")
    val rows = (1 to 4).map { m =>
      Row(m.toLong, 1L, "F", m * 100.0,
        Timestamp.valueOf(f"1995-$m%02d-15 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = TimeSeries.tsMannKendall(spark, dir).head
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 6L, "all 6 pairs rise")
    val var18 = 4L * 3L * 13L
    assert(r.getLong(3) == var18)
    val z = math.floor(
      (6.0 - 1.0) / math.sqrt(var18 / 18.0) * 1e6 + 0.5).toLong
    assert(r.getLong(4) == z, s"z ${r.getLong(4)} != $z")
  }

  test("pack_mask_waste: a full-doc sequence wastes nothing, a split one half") {
    val dir = tmpDir("r7b7_mw")
    def doc(id: Long, nTok: Int) =
      Row(id, Seq.fill(nTok)("w").mkString(" "), "en", "s0",
        (2 * nTok - 1).toLong)
    val rows = Seq(doc(1L, 512), doc(2L, 256), doc(3L, 256))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.maskWaste(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val full = 512L * 513L / 2
    assert(got(0L) == ((1L, 512L, full, full, 0L)))
    val within = 2L * (256L * 257L / 2)
    val waste = (full - within) * 1000000L / full
    assert(got(1L) == ((2L, 512L, within, full, waste)))
  }

  test("pack_grpo_advantage: group-relative z-scores, constant group NULL") {
    val dir = tmpDir("r7b7_gr")
    val rows = Seq(
      (1L, 1L, 1.00), (2L, 1L, 2.00), (3L, 1L, 3.00), (4L, 1L, 4.00),
      (5L, 2L, 1.00), (6L, 2L, 1.00), (7L, 2L, 1.00), (8L, 2L, 1.00))
      .map { case (k, ck, p) =>
        Row(k, ck, "F", p, Timestamp.valueOf("2024-01-01 00:00:00"),
          "1-X")
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TrainingData.grpoAdvantage(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    def z(r: Long, n: Long, sr: Long, srr: Long): Long =
      math.floor((r * n - sr).toDouble /
        math.sqrt((n * srr - sr * sr).toDouble) * 1e6 + 0.5).toLong
    val (sr, srr) = (1000L, 100L * 100 + 200L * 200 + 300L * 300 +
      400L * 400)
    assert(got(1L) == ((-600L, Some(z(100, 4, sr, srr)))))
    assert(got(4L) == ((600L, Some(z(400, 4, sr, srr)))))
    // zero-variance group: advantage numerator 0, z undefined → NULL
    assert(got(5L) == ((0L, None)))
  }

  test("eval_auc_slices: a perfectly separating slice scores 1, a one-class slice NULL") {
    val dir = tmpDir("r7b7_as")
    val rows = Seq(
      // s0: every en doc longer than every non-en → AUC 1
      (1L, "en", "s0", 100L), (2L, "en", "s0", 90L),
      (3L, "de", "s0", 50L), (4L, "fr", "s0", 40L),
      // s1: all en → AUC undefined
      (5L, "en", "s1", 10L), (6L, "en", "s1", 20L))
      .map { case (id, lang, src, nc) => Row(id, "x", lang, src, nc) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Evaluation.aucSlices(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("s0") == ((2L, 2L, Some(1.0))))
    assert(got("s1") == ((2L, 0L, None)))
  }
}
