package graft

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("resample + forward fill: gaps carry the last observation") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:10:00", 10.0),
      (1L, "2024-01-01 03:20:00", 30.0),
      (2L, "2024-01-01 02:05:00", 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val got = TimeSeries.resampleFfill(events,
        "2024-01-01 00:00:00", "2024-01-01 05:00:00")
      .orderBy("user_id", "h")
      .select(col("user_id"), hour(col("h")).as("hh"), col("v"), col("fv"))
      .as[(Long, Int, Option[Double], Option[Double])].collect().toSeq

    val u1 = got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4))
    assert(u1 == Seq(
      (0, Some(10.0), Some(10.0)),
      (1, None, Some(10.0)),
      (2, None, Some(10.0)),
      (3, Some(30.0), Some(30.0)),
      (4, None, Some(30.0)),
      (5, None, Some(30.0))))

    val u2 = got.filter(_._1 == 2L).map(r => (r._2, r._3, r._4))
    // Before the first observation fv stays null (nothing to fill from).
    assert(u2 == Seq(
      (0, None, None),
      (1, None, None),
      (2, Some(5.0), Some(5.0)),
      (3, None, Some(5.0)),
      (4, None, Some(5.0)),
      (5, None, Some(5.0))))
  }

  test("spine covers every user × grid hour") {
    import spark.implicits._
    val events = Seq((1L, "2024-01-01 00:00:00", 1.0),
      (7L, "2024-01-01 04:00:00", 2.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val n = TimeSeries.resampleFfill(events,
      "2024-01-01 00:00:00", "2024-01-01 23:00:00").count()
    assert(n == 2 * 24)
  }
}
