package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Dedup, Relational, Similarity}

/** Planted-fixture invariants for the seventh round-6 operator
  * batch: explode_outer null preservation, prefix-truncation dedup,
  * embedding sign-cell PSI drift, and k-anonymity ladder
  * generalization. */
class RoundSixBatchSevenSpec extends SparkSpec {

  test("q53_explode_outer: customers without orders keep a NULL row") {
    val dir = tmpDir("r6b7_eo")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 3L).map(k => Row(k, s"c$k", 0, 0.0, "S")), 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val od = Seq((10L, 1L), (11L, 1L), (30L, 3L)).map { case (o, c) =>
      Row(o, c, "F", 1.0, new java.sql.Timestamp(0L), "1-URGENT") }
    spark.createDataFrame(
      spark.sparkContext.parallelize(od, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q53ExplodeOuter(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((1L, 10L), (1L, 11L), (2L, -1L),
      (3L, 30L)))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("dedup_prefix_truncation: planted half-cut copy and a natural " +
    "prefix pair are both found; short docs excluded") {
    val dir = tmpDir("r6b7_trunc")
    val rows = Seq(
      Row(1L, "abcd" * 20, "en", "s", 80L),          // gets copy 30001
      Row(2L, "x" * 40, "en", "s", 40L),             // prefix of doc 3
      Row(3L, "x" * 40 + "y" * 10, "en", "s", 50L),
      Row(4L, "tiny", "en", "s", 4L))                // < 32 chars: out
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.prefixTruncation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((2L, 3L, 40L, 50L),
      (30001L, 1L, 40L, 80L)))
  }

  test("embed_drift_psi: sign cells, Laplace smoothing, snapped " +
    "terms reproduced independently") {
    val dir = tmpDir("r6b7_psi")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def v(a: Double, b: Double, c: Double, d: Double) =
      Seq(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
    val rows = Seq(
      Row(0L, v(1, 1, 1, 1), 0),     // cell 15, ref
      Row(1L, v(1, 1, 1, 1), 0),     // cell 15, cur
      Row(2L, v(-1, -1, -1, -1), 0), // cell 0, ref
      Row(3L, v(-1, 1, -1, 1), 0))   // cell 10, cur
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embedDriftPsi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // Independent fold of the same snapping recipe.
    def term(nr: Long, nc: Long): Double = {
      val pr = (nr + 1).toDouble / 18.0
      val pc = (nc + 1).toDouble / 18.0
      math.floor((pc - pr) * math.log(pc / pr) * 1e9 + 0.5) / 1e9
    }
    val t0 = term(1, 0); val t10 = term(0, 1); val t15 = term(1, 1)
    val tot = t0 + t10 + t15
    assert(got.toSeq === Seq(
      (0L, 1L, 0L, t0, tot), (10L, 0L, 1L, t10, tot),
      (15L, 1L, 1L, t15, tot)))
  }

  test("dq_generalize_k: first ladder level meeting k=50 is the " +
    "release level") {
    val dir = tmpDir("r6b7_gen")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    // nations 0 (60 rows) and 3 (40 rows), one segment: L0 min 40
    // fails k=50; L1 folds both into region 0 -> 100 passes.
    val rows = (1 to 60).map(i =>
      Row(i.toLong, s"c$i", 0, 0.0, "S")) ++
      (61 to 100).map(i => Row(i.toLong, s"c$i", 3, 0.0, "S"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = DataQuality.generalizeK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (0L, 2L, 40L, false, false),
      (1L, 1L, 100L, true, true),
      (2L, 1L, 100L, true, false),
      (3L, 1L, 100L, true, false)))
  }
}
