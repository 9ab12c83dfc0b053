package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Maintenance}

class DataQualitySpec extends SparkSpec {

  test("profile counts every rule in one pass") {
    import spark.implicits._
    val df = Seq(
      (1, Some(10.0)), (2, None), (3, Some(-5.0)), (4, Some(200.0)))
      .toDF("id", "v")
    val row = DataQuality.profile(df, Seq(
      DataQuality.Rule("n_null", col("v").isNull),
      DataQuality.Rule("n_negative", col("v") < 0.0),
      DataQuality.Rule("n_too_big", col("v") > 100.0))).head()
    assert(row.getLong(0) == 4)   // n_rows
    assert(row.getLong(1) == 1)   // null
    assert(row.getLong(2) == 1)   // negative
    assert(row.getLong(3) == 1)   // too big
  }

  test("orphanCount finds FK violations") {
    import spark.implicits._
    val child = Seq((1, "a"), (2, "b"), (9, "x")).toDF("fk", "v")
    val parent = Seq((1, "p"), (2, "q")).toDF("pk", "w")
    val n = DataQuality.orphanCount(child, "fk", parent, "pk")
      .head().getLong(0)
    assert(n == 1)
  }

  test("histogram clamps out-of-range values into edge buckets") {
    import spark.implicits._
    val df = Seq(-10.0, 0.0, 5.0, 15.0, 95.0, 150.0).toDF("v")
    val got = DataQuality.valueHistogram(df, col("v"), 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 1L, 9L -> 2L))
  }

  test("scd2 versions a change log per key with open-ended current row") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, "2024-01-01 00:00:00", "bronze"),
      (1L, 101L, "2024-02-01 00:00:00", "silver"),
      (1L, 102L, "2024-03-01 00:00:00", "gold"),
      (2L, 200L, "2024-01-15 00:00:00", "bronze"))
      .toDF("k", "change_id", "ts_s", "tier")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = Maintenance.scd2FromLog(log, "k", "ts", "change_id")
      .orderBy("k", "effective_from")
      .select("k", "tier", "is_current")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "bronze", false), (1L, "silver", false), (1L, "gold", true),
      (2L, "bronze", true)))
    // effective_to chains: each non-current row ends where the next begins.
    val chain = Maintenance.scd2FromLog(log, "k", "ts", "change_id")
      .filter(col("k") === 1L).orderBy("effective_from")
      .select("effective_from", "effective_to").collect()
    assert(chain(0).getTimestamp(1) == chain(1).getTimestamp(0))
    assert(chain(1).getTimestamp(1) == chain(2).getTimestamp(0))
    assert(chain(2).isNullAt(1))
  }
}
