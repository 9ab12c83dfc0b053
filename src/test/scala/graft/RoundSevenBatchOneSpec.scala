package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, Graph, Learn, TimeSeries}

/** Planted-fixture invariants for the first round-7 operator batch:
  * Kaplan–Meier/Nelson–Aalen survival, Bradley–Terry strengths,
  * Cliff's delta, UCB1 scoring, and the rich-club curve. */
class RoundSevenBatchOneSpec extends SparkSpec {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventsDir(prefix: String,
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    val dir = tmpDir(prefix)
    val data = rows.map { case (id, t, u, et, v) =>
      Row(id, Timestamp.valueOf(t), u, et, v, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_kaplan_meier: hand-computed risk table, hazard and log-survival") {
    val dir = tmpDir("r7b1_km")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    // cutoff is 2001-01-01: t=0 event, t=2 event, t=3 CENSORED
    // (ships past cutoff, order 3 days before it), t=4 event.
    val orders = Seq(
      (1L, "2000-12-01"), (2L, "2000-12-01"),
      (3L, "2000-12-29"), (4L, "2000-12-30")).map { case (k, d) =>
      Row(k, 1L, "F", 100.0, Timestamp.valueOf(s"$d 00:00:00"), "1-X")
    }
    val items = Seq(
      (1L, "2000-12-03"), (2L, "2000-12-05"),
      (3L, "2001-02-01"), (4L, "2000-12-30")).map { case (k, d) =>
      Row(k, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf(s"$d 00:00:00"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(orders, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.createDataFrame(
      spark.sparkContext.parallelize(items, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = TimeSeries.tsKaplanMeier(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def snap9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    val l0 = snap9(math.log(3.0 / 4.0))
    val l2 = snap9(math.log(2.0 / 3.0))
    assert(got.keySet == Set(0L, 2L, 3L, 4L))
    assert(got(0L) == ((4L, 1L, 0L, 250000L, l0)))
    assert(got(2L) == ((3L, 1L, 0L, 250000L + 333333L, l0 + l2)))
    assert(got(3L) == ((2L, 0L, 1L, 583333L, l0 + l2)))
    // final step: d = n_risk → survival hits 0; log contributes 0 by
    // convention, the hazard records the full 1e6 term exactly
    assert(got(4L) == ((1L, 1L, 0L, 1583333L, l0 + l2)))
  }

  test("eval_bradley_terry: two MM steps over planted duels") {
    // click beats view on 2 user-days, loses on 1 → W_click=2, n=3.
    val dir = eventsDir("r7b1_bt", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "view", 0.0),
      (4L, "2024-01-01 11:00:00", 3L, "click", 0.0),
      (5L, "2024-01-01 11:01:00", 3L, "click", 0.0),
      (6L, "2024-01-01 11:02:00", 3L, "view", 0.0),
      (7L, "2024-01-01 12:00:00", 2L, "view", 0.0),
      (8L, "2024-01-01 12:01:00", 2L, "view", 0.0),
      (9L, "2024-01-01 12:02:00", 2L, "click", 0.0)))
    val got = Evaluation.bradleyTerry(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val (wC, nC) = (2L, 3L)
    val (wV, nV) = (1L, 3L)
    val pi1C = 2 * wC * 1000000L / nC // 1333333
    val pi1V = 2 * wV * 1000000L / nV // 666666
    def snap9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    def pi2(w: Long, n: Long, pa: Long, pb: Long): Long = {
      val d9 = snap9(n.toDouble / ((pa + pb).toDouble / 1e6))
      math.floor(w.toDouble / (d9.toDouble / 1e9) * 1e6 + 0.5).toLong
    }
    assert(got("click") ==
      ((wC, nC, pi1C, pi2(wC, nC, pi1C, pi1V))))
    assert(got("view") ==
      ((wV, nV, pi1V, pi2(wV, nV, pi1V, pi1C))))
    // the winner's strength stays ahead after the pairwise step
    assert(got("click")._4 > got("view")._4)
  }

  test("eval_cliffs_delta: exact pair counts from the merged histogram") {
    val dir = tmpDir("r7b1_cliffs")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    // BUILDING {10, 20, 30} vs MACHINERY {15}: gt=2, lt=1, δ=1/3
    val rows = Seq(
      (1L, 10.0, "BUILDING"), (2L, 20.0, "BUILDING"),
      (3L, 30.0, "BUILDING"), (4L, 15.0, "MACHINERY"),
      (5L, 99.0, "AUTOMOBILE")).map { case (k, b, seg) =>
      Row(k, s"c$k", 1, b, seg)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = Evaluation.cliffsDelta(spark, dir).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 1L, 2L, 1L, 333333L)))
  }

  test("learn_ucb1: exploration bonus picks the under-pulled arm") {
    val dir = eventsDir("r7b1_ucb", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A", 60.0),
      (2L, "2024-01-01 10:01:00", 1L, "A", 70.0),
      (3L, "2024-01-01 10:02:00", 1L, "A", 10.0),
      (4L, "2024-01-01 10:03:00", 1L, "A", 20.0),
      (5L, "2024-01-01 10:04:00", 1L, "B", 10.0)))
    val got = Learn.ucb1(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(6)))).toMap
    def bonus(n: Long, tot: Long): Long =
      math.floor(math.sqrt(2.0 * math.log(tot.toDouble) / n) * 1e6
        + 0.5).toLong
    assert(got("A") == ((4L, 2L, 500000L, bonus(4, 5), false)))
    assert(got("B") == ((1L, 0L, 0L, bonus(1, 5), true)))
    // the 1-pull arm's bonus dominates the 4-pull arm's mean + bonus
    assert(bonus(1, 5) > 500000L + bonus(4, 5))
  }

  test("graph_rich_club: hand-built hub graph yields the exact curve") {
    // Undirected transition edges: AB, AC, BC, AD.
    // Degrees: A=3, B=2, C=2, D=1 → k ∈ {0, 1, 2}.
    val dir = eventsDir("r7b1_rc", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "B", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "A", 0.0),
      (4L, "2024-01-01 11:00:00", 2L, "A", 0.0),
      (5L, "2024-01-01 11:01:00", 2L, "C", 0.0),
      (6L, "2024-01-01 12:00:00", 3L, "B", 0.0),
      (7L, "2024-01-01 12:01:00", 3L, "C", 0.0),
      (8L, "2024-01-01 13:00:00", 4L, "A", 0.0),
      (9L, "2024-01-01 13:01:00", 4L, "D", 0.0)))
    val got = Graph.richClub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L) == ((4L, 4L, 666666L))) // 2·4/(4·3)
    assert(got(1L) == ((3L, 3L, 1000000L))) // the hub triangle is complete
    assert(got(2L) == ((1L, 0L, -1L))) // φ undefined below 2 members
  }
}
