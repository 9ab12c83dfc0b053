package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, Graph, TimeSeries}

/** Planted-fixture invariants for the eighth round-6 operator batch:
  * Krippendorff's alpha with missing ratings, the directed motif
  * census, and the winsorization report. */
class RoundSixBatchEightSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  test("eval_krippendorff: hand-folded alpha with missing ratings " +
    "and an unpairable item dropped") {
    // k=1: ra=0 rb=0 rc=1 -> m=3, d=(9-5)/2=2
    // k=5: ra=1 rb=missing rc=2 -> m=2, d=2
    // k=7: ra=2 rb=1 rc=missing -> m=2, d=2
    // k=35: ra=0, both missing -> m=1, dropped
    // n=7, A=6; margins 0:2 1:3 2:2 -> sc=17, E=49-17=32
    // alpha = 1 - 6*6/32 = -0.125 -> -125000 ppm
    val dir = tmpDir("r6b8_kripp")
    val rows = Seq(
      Row(1L, 1L, "F", 40000.0, new Timestamp(0L), "1-URGENT"),
      Row(5L, 1L, "F", 60000.0, new Timestamp(0L), "3-MEDIUM"),
      Row(7L, 1L, "F", 60000.0, new Timestamp(0L), "5-LOW"),
      Row(35L, 1L, "F", 40000.0, new Timestamp(0L), "1-URGENT"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Evaluation.krippendorffAlpha(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 7L, 6L, 32L, -125000L)))
  }

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("properties", StringType)))

  private def eventsDir(name: String, rows: Seq[Row]): String = {
    val dir = tmpDir(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("graph_motif_census: one feed-forward triad, one 3-cycle, " +
    "one reciprocal dyad on a planted digraph") {
    def walk(user: Long, base: Long, steps: Seq[String]): Seq[Row] =
      steps.zipWithIndex.map { case (t, i) =>
        Row(base + i, new Timestamp(1700000000000L + i * 60000L),
          user, t, 1.0, "{}")
      }
    // edges: a->b, b->c (u1); a->c, c->a (u2)
    val dir = eventsDir("r6b8_motif",
      walk(1L, 100, Seq("a", "b", "c")) ++
        walk(2L, 200, Seq("a", "c", "a")))
    val r = Graph.motifCensus(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 1L, 1L, 1L)))
  }

  test("ts_winsorize: exact discrete fences and clip accounting") {
    // values 1..20 (1e-4 units): p05 = rank ceil(1) -> 1,
    // p95 = rank ceil(19) -> 19; one high clip: 20 -> 19.
    val dir = eventsDir("r6b8_wins", (1 to 20).map(i =>
      Row(i.toLong, new Timestamp(1700000000000L + i * 1000L),
        1L, "a", i * 0.0001, "{}")))
    val r = TimeSeries.tsWinsorize(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      === ((20L, 1L, 19L, 0L, 1L, 210L, 209L)))
  }
}
