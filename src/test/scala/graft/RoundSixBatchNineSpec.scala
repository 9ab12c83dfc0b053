package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Learn, Multimodal, ParityQueries, Relational}

/** Planted-fixture invariants for the ninth round-6 operator batch:
  * SVM subgradient steps, calendar arithmetic, byte-range chunk
  * plans, and footer key-value lineage. */
class RoundSixBatchNineSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDir(name: String, rows: Seq[Row]): String = {
    val dir = tmpDir(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("learn_svm_step: hand-folded hinge subgradients, both rows " +
    "stay margin-violating") {
    // doc1: en -> y=+1, x1=0.003, x2=1/3; doc2: de -> y=-1,
    // x1=0.005, x2=0.4. g0 cancels; g1 = -3e6+5e6 = 2e6;
    // g2 = floor(-1e9/3+0.5) + 4e8 = 66666667.
    val dir = docsDir("r6b9_svm", Seq(
      Row(1L, "a b", "en", "s", 3L),
      Row(2L, "c d e", "de", "s", 5L)))
    val got = Learn.svmSteps(spark, dir).collect()
    val b1 = -2.0e6 / 2.0e9
    val b2 = -66666667.0 / 2.0e9
    assert((got(0).getLong(0), got(0).getDouble(1), got(0).getDouble(2),
      got(0).getDouble(3), got(0).getLong(4))
      === ((1L, 0.0, b1, b2, 2L)))
    // both rows stay active at w1 (margins ~0), so step 2 doubles w.
    assert((got(1).getLong(0), got(1).getDouble(1), got(1).getDouble(2),
      got(1).getDouble(3), got(1).getLong(4))
      === ((2L, 0.0, b1 + b1, b2 + b2, 2L)))
  }

  test("q54_date_functions: end-of-month clamp, ISO week, dow, " +
    "day diff on pinned dates") {
    val dir = tmpDir("r6b9_dates")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val rows = Seq(
      Row(1L, 1L, "F", 1.0, new Timestamp(791510400000L), "1"), // 1995-01-31 Tue
      Row(2L, 1L, "F", 1.0, new Timestamp(795225600000L), "1")) // 1995-03-15 Wed
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q54DateFunctions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getDate(3).toString,
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, "1995-01-31", "1995-04-30", "1995-01-30", 3L, 30L),
      (2L, "1995-03-31", "1995-06-15", "1995-03-13", 4L, 73L)))
  }

  test("multimodal_chunks: 600-byte payload splits into 256/256/88; " +
    "empty payloads yield no chunks") {
    val dir = docsDir("r6b9_chunks", Seq(
      Row(1L, "x" * 600, "en", "s", 600L),
      Row(2L, "", "en", "s", 0L)))
    val got = Multimodal.byteChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 0L, 0L, 256L), (1L, 1L, 256L, 256L),
      (1L, 2L, 512L, 88L)))
  }

  test("conv_footer_kv: lineage metadata lands in the footer and " +
    "survives a read-back") {
    val dir = docsDir("r6b9_kv", (1L to 5L).map(i =>
      Row(i, s"text $i", "en", "s", 6L)))
    val r = ParityQueries.convFooterKv(spark, dir).collect().head
    assert((r.getBoolean(0), r.getBoolean(1), r.getLong(2))
      === ((true, true, 5L)))
  }
}
