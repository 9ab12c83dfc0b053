package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, ParityQueries}

/** Planted-fixture invariants for the sixteenth round-6 operator
  * batch: mean average precision and file provenance. */
class RoundSixBatchSixteenSpec extends SparkSpec {

  test("eval_map: perfect rankings score 1.0, a relevant vector " +
    "pushed out of the top-10 costs exactly one third") {
    val dir = tmpDir("r6b16_map")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val rows = Seq(
      Row(0L, v(1, 0), 1),
      Row(100L, v(1, 0), 1), Row(101L, v(1, 0), 1),
      Row(102L, v(-1, 0.1), 1)) ++ // rel but ranked past the top-10
      (1L to 7L).map(k => Row(k, v(0, 1), 2)) ++
      Seq(Row(200L, v(0, 1), 2))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Evaluation.mapGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // q0: hits at ranks 1,2 (ids 100,101), third relevant (102) is
    // rank 11 -> terms 1e6+1e6, R=3 -> AP = 666666 ppm.
    assert(got.head === ((0L, 3L, 2L, 666666L)))
    // q1..q7: the 7 other label-2 vectors fill ranks 1..7 -> AP = 1.
    got.tail.foreach { case (_, nRel, hits, ap) =>
      assert((nRel, hits, ap) === ((7L, 7L, 1000000L)))
    }
  }

  test("conv_provenance: file tags partition the rows exactly") {
    val dir = tmpDir("r6b16_prov")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val rows = (1L to 6L).map(k =>
      Row(k, 1L, "F", 1.0, new Timestamp(0L), "1"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ParityQueries.convProvenance(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getBoolean(2))
      === ((2L, 6L, true)))
  }
}
