package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, TimeSeries}

/** Planted-fixture invariants for the eleventh round-7 batch:
  * maximum drawdown and the Poisson volume control chart. */
class RoundSevenBatchElevenSpec extends SparkSpec {

  test("ts_drawdown: hand-traced peak-to-trough on a V-shaped curve") {
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val dir = tmpDir("r7b11_dd")
    val rows = Seq(3.00, 1.00, 1.00, 3.00).zipWithIndex.map {
      case (p, i) =>
        Row((i + 1).toLong, 1L, "F", p,
          Timestamp.valueOf(f"2024-01-0${i + 1} 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // net = [100,-100,-100,100], curve = [100,0,-100,0],
    // peak 100 throughout → max drawdown 200 at day 3
    val r = TimeSeries.tsDrawdown(spark, dir).head
    assert(r.getDate(0).toString == "2024-01-03")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, -100L, 200L)))
    assert(r.getLong(4) == 2000000L, "drawdown = 2× the peak")
  }

  test("dq_control_chart: a 3-sigma spike flags above, steady days don't") {
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val dir = tmpDir("r7b11_cc")
    var id = 0L
    val rows = (1 to 9).flatMap { d =>
      val n = if (d == 9) 30 else 10
      (1 to n).map { _ =>
        id += 1
        Row(id, Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
          id, "load", 0.0, "{}")
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = DataQuality.controlChart(spark, dir).head
    assert((r.getLong(1), r.getLong(2)) == ((9L, 110L)))
    assert(r.getLong(3) == 1L, "exactly the spike day is above")
    assert(r.getLong(4) == 0L, "no day dips below the band")
  }
}
