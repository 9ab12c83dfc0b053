package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Learn}

/** Planted-fixture invariants for the second round-6 operator batch:
  * smoothed/LOO target encoding, hashing-trick featurization, and
  * functional-dependency auditing. */
class RoundSixBatchTwoSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def ordersDir(rows: Seq[(Long, Long, String, String)]): String = {
    val dir = tmpDir("r6b2_orders")
    val data = rows.map { case (k, ck, st, pr) =>
      Row(k, ck, st, 100.0, new Timestamp(1700000000000L), pr)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("learn_target_encode: smoothed and LOO encodings are the " +
    "exact integer floor divisions") {
    // Categories: A = {F, F, O}, B = {O, O}; prior = 2/5, m = 20.
    val dir = ordersDir(Seq(
      (1L, 1L, "F", "A"), (2L, 1L, "F", "A"), (3L, 1L, "O", "A"),
      (4L, 2L, "O", "B"), (5L, 2L, "O", "B")))
    val got = Learn.targetEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // A: enc = (2*5 + 20*2)*1e6 // (5*(3+20)) = 50e6 // 115
    assert(got(1L) === ((434782L, 409090L))) // y=1: loo 45e6 // 110
    assert(got(3L) === ((434782L, 454545L))) // y=0: loo 50e6 // 110
    // B: enc = 40e6 // 110; y=0 loo = 40e6 // 105
    assert(got(4L) === ((363636L, 380952L)))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("learn_feature_hash: polynomial-roll buckets and signs " +
    "reproduce the hand computation") {
    val dir = tmpDir("r6b2_docs")
    val data = Seq(Row(1L, "ab ab ba", "en", "s", 8L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // "ab": h = (0*31+97)*31 + 98 = 3105 -> bucket 33, bit 48 even +1
    // "ba": h = 98*31 + 97 = 3135       -> bucket 63, bit 48 even +1
    val got = Learn.featureHash(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((33L, 2L, 2L), (63L, 1L, 1L)))
  }

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_returnflag", StringType)))

  test("dq_fd_check: planted violation is counted, clean FD holds") {
    val dir = ordersDir(Seq(
      (1L, 7L, "F", "A"), (2L, 7L, "F", "B"), (3L, 8L, "O", "A")))
    val li = Seq(
      Row(1L, 10L, 100L, "A"), Row(1L, 11L, 110L, "A"),
      Row(2L, 10L, 100L, "A"), Row(2L, 12L, 120L, "B"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(li, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = DataQuality.fdCheck(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // orderkey 2 has returnflags {A, B} -> one violating group
    assert(got("l_orderkey->l_returnflag") === ((2L, 1L, 2L, 0L)))
    // every partkey maps to exactly one suppkey -> FD holds
    assert(got("l_partkey->l_suppkey") === ((3L, 0L, 1L, 1L)))
    // custkey 7 ordered at priorities {A, B} -> violated
    assert(got("o_custkey->o_orderpriority") === ((2L, 1L, 2L, 0L)))
  }
}
