package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Graph, TrainingData}

/** Planted-fixture invariants for the fifteenth round-6 operator
  * batch: keyed pseudonymization and temporal BFS. */
class RoundSixBatchFifteenSpec extends SparkSpec {

  test("pii_pseudonymize: injective mapping, join cardinality " +
    "preserved, no raw key leaks") {
    val dir = tmpDir("r6b15_pseud")
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
      Row(o, c, "F", 1.0, new Timestamp(0L), "1") }
    spark.createDataFrame(
      spark.sparkContext.parallelize(od, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = TrainingData.pseudonymize(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) === ((3L, 3L, 0L, 3L, 3L, true)))
  }

  test("graph_temporal_bfs: an edge that departs before you arrive " +
    "is unusable — static reachability is refuted") {
    val dir = tmpDir("r6b15_tbfs")
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("properties", StringType)))
    // u1: b(t=100) -> c(t=200)   [departs BEFORE a->b arrives]
    // u2: a(t=300) -> b(t=400)
    val rows = Seq(
      Row(1L, new Timestamp(100L), 1L, "b", 1.0, "{}"),
      Row(2L, new Timestamp(200L), 1L, "c", 1.0, "{}"),
      Row(3L, new Timestamp(300L), 2L, "a", 1.0, "{}"),
      Row(4L, new Timestamp(400L), 2L, "b", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.temporalBfs(spark, dir).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    // a is the source (arrival 0); a->b arrives at 400; the b->c
    // edge departed at 100 < 400, so c is temporally UNREACHABLE
    // even though the static graph has the path a->b->c.
    assert(got.toSeq === Seq(("a", 0L), ("b", 400L), ("c", -1L)))
  }
}
