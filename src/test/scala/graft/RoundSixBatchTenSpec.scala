package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, LanguageModel, Relational}

/** Planted-fixture invariants for the tenth round-6 operator batch:
  * BPE tokenizer fertility, the outlier vote ensemble, and the
  * string-function surface. */
class RoundSixBatchTenSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("text_bpe_fertility: merged languages reach fertility 1, the " +
    "partially-merged one stays at 2") {
    // merges: r1 (a,b) cnt 3; r2 (c,d) cnt 2; r3 (w,x); r4 (wx,y).
    // en 'ab' -> 1 token; de 'cd' -> 1; fr 'wxyz' -> [wxy, z] = 2.
    val dir = tmpDir("r6b10_fert")
    val rows = Seq(
      Row(1L, "ab ab ab", "en", "s", 8L),
      Row(2L, "cd cd", "de", "s", 5L),
      Row(3L, "wxyz wxyz", "fr", "s", 9L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LanguageModel.bpeFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(("de", 2L, 2L, 1000000L),
      ("en", 3L, 3L, 1000000L), ("fr", 2L, 4L, 2000000L)))
  }

  test("dq_outlier_ensemble: a 10x spike trips MAD and IQR but not " +
    "the p95 band, normals trip nothing") {
    val dir = tmpDir("r6b10_ens")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val day0 = 788918400000L // 1995-01-01 UTC
    val rows = (0 until 11).map { i =>
      val price = if (i == 10) 1000.0 else 100.0
      Row(i.toLong + 1, 1L, "F", price,
        new Timestamp(day0 + i.toLong * 86400000L), "1")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = DataQuality.outlierEnsemble(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
    // spike day: MAD=0 so |x-med|>0 trips; IQR fences collapse to
    // the median so it trips; p95 IS the spike value, so the band
    // screen does NOT trip -> exactly 2 votes.
    assert(got.toSeq === Seq(
      ("1995-01-11", 100000L, true, true, false, 2L)))
  }

  test("q55_string_surface: padding truncates long names; split/" +
    "search are 1-based") {
    val dir = tmpDir("r6b10_str")
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    val rows = Seq(
      Row(1L, "small ring", "B", "T", 1, 1.0),
      Row(2L, "extra long part name xyz", "B", "T", 1, 1.0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), partSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Relational.q55StringSurface(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5),
        r.getString(6), r.getLong(7)))
    assert(got(0) === ((1L, ".........." + "small ring",
      "small ring" + "..........", "gnir llams", "smasma",
      "small_ring", "ring", 3L)))
    assert(got(1) === ((2L, "extra long part name",
      "extra long part name", "zyx eman trap gnol artxe",
      "extext", "extra_long_part_name_xyz", "long", 5L)))
  }
}
