package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Similarity, TextAnalysis}

/** Planted-fixture invariants for the thirteenth round-6 operator
  * batch: filtered vector search, candidate-key discovery, and
  * source vocabulary overlap. */
class RoundSixBatchThirteenSpec extends SparkSpec {

  test("sim_filtered_topk: a high-similarity wrong-label vector is " +
    "excluded; ranks are label-local") {
    val dir = tmpDir("r6b13_ftk")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val rows = Seq(
      Row(0L, v(1, 0), 1), Row(1L, v(0, 1), 2),
      Row(100L, v(2, 0), 1),     // label 1, sim(q0)=1.0
      Row(101L, v(0.9, 0.1), 2), // label 2: HIGH sim to q0, filtered
      Row(102L, v(1, 1), 1),     // label 1, sim ~.707
      Row(103L, v(0, 1), 1))     // label 1, sim 0
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.filteredTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 1, 100L, 1L), (0L, 1, 102L, 2L), (0L, 1, 103L, 3L),
      (1L, 2, 101L, 1L)))
  }

  test("dq_key_discovery: unique, duplicated, and nulled columns " +
    "each get the right verdict in one pass") {
    val dir = tmpDir("r6b13_key")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val ts = new Timestamp(0L)
    val rows = Seq(
      Row(1L, 1L, "F", 1.0, ts, "1"),
      Row(2L, 1L, "F", 2.0, ts, "2"),
      Row(3L, 2L, null, 3.0, ts, "3"),
      Row(4L, 2L, "O", 4.0, ts, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val m = DataQuality.keyDiscovery(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(m("o_orderkey") === ((4L, 0L, true)))
    assert(m("o_custkey") === ((2L, 0L, false)))
    assert(m("o_orderstatus") === ((2L, 1L, false)))
    assert(m("o_totalprice") === ((4L, 0L, true)))
    assert(m("o_orderdate") === ((1L, 0L, false)))
    assert(m("o_orderpriority") === ((3L, 1L, true)))
  }

  test("text_source_overlap: shared vocabulary pairs rank first with " +
    "exact Jaccard ppm") {
    val dir = tmpDir("r6b13_ovl")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "x y z", "en", "a", 5L),
      Row(2L, "x y w", "en", "b", 5L),
      Row(3L, "q", "en", "c", 1L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // zero-overlap pairs carry no signal and are not emitted
    assert(got.toSeq === Seq(("a", "b", 2L, 500000L)))
  }
}
