package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Graph, ParityQueries, TimeSeries, TrainingData}

/** Planted-fixture invariants for the eighth round-7 operator batch:
  * Ljung–Box whiteness, MLM mask plan, transition entropy, and the
  * CSV comment contract. */
class RoundSevenBatchEightSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("ts_ljung_box: an alternating series replays the exact snapped Q") {
    val dir = tmpDir("r7b8_lb")
    val revs = Seq(100.0, 200.0, 100.0, 200.0, 100.0, 200.0, 100.0,
      200.0)
    val rows = revs.zipWithIndex.map { case (r, i) =>
      Row((i + 1).toLong, 1L, "F", r,
        Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = TimeSeries.tsLjungBox(spark, dir).head
    assert(r.getLong(0) == 8L && r.getLong(1) == 7L)
    // replicate the snapped pipeline by hand
    val n = 8
    val sr = revs.sum
    val srr = revs.map(x => x * x).sum
    val q = {
      val terms = (1 to 7).map { k =>
        val sxy = (0 until n - k).map(i => revs(i) * revs(i + k)).sum
        val rho9 = math.floor(
          (sxy - (n - k) * (sr / n) * (sr / n)) /
            (srr - sr * sr / n) * 1e9 + 0.5).toLong
        math.floor(rho9.toDouble * rho9 / 1e9 / (n - k) + 0.5).toLong
      }.sum
      math.floor(n.toDouble * (n + 2) * terms / 1e9 * 1e6 + 0.5).toLong
    }
    assert(r.getLong(2) == q, s"Q ${r.getLong(2)} != $q")
    assert(r.getLong(2) > 10000000L, "strong lag structure → large Q")
  }

  test("pack_mlm_mask: ~15% rate, 80/10/10 split, exhaustive accounting") {
    val rows = TrainingData.mlmMask(spark, "/root/testdata/sf0.001")
      .collect()
    val (tok, mask, rnd, keep) = (rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum,
      rows.map(_.getLong(4)).sum)
    val masked = mask + rnd + keep
    val rate = masked.toDouble / tok
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
    assert(mask.toDouble / masked > 0.7 && mask.toDouble / masked < 0.9)
    assert(rnd.toDouble / masked > 0.05 && rnd.toDouble / masked < 0.15)
    assert(keep.toDouble / masked > 0.05 && keep.toDouble / masked < 0.15)
    // reproducible plan: same decisions on a second run
    val again = TrainingData.mlmMask(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("graph_transition_entropy: deterministic chain 0, uniform fork ln2") {
    val dir = tmpDir("r7b8_te")
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A"),
      (2L, "2024-01-01 10:01:00", 1L, "B"),
      (3L, "2024-01-01 11:00:00", 2L, "A"),
      (4L, "2024-01-01 11:01:00", 2L, "C"),
      (5L, "2024-01-01 12:00:00", 3L, "B"),
      (6L, "2024-01-01 12:01:00", 3L, "D")).map { case (id, t, u, e) =>
      Row(id, Timestamp.valueOf(t), u, e, 0.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.transitionEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // A forks uniformly to B and C → H = ln 2, normalized exactly 1
    val halfTerm = math.floor(0.5 * math.log(2.0) * 1e9 + 0.5).toLong
    assert(got("A") == ((2L, 2 * halfTerm, 1000000L)))
    // B chains deterministically to D → zero entropy, norm undefined
    assert(got("B") == ((1L, 0L, -1L)))
  }

  test("conv_csv_comments: comment lines vanish, every record survives") {
    val dir = tmpDir("r7b8_cc")
    val rows = (1L to 10L).map { k =>
      Row(k, k * 10, "F", 1.0,
        Timestamp.valueOf("2024-01-01 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ParityQueries.convCsvComments(spark, dir).head
    assert(r.getLong(0) == 10L, "all records survive, no comment leaks")
    assert(r.getLong(1) == 55L)
    assert(r.getLong(2) == 550L)
  }
}
