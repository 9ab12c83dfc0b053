package graft

import java.sql.Timestamp

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: inclusive boundary, latest-prior pick, tie-break, no-match null") {
    import spark.implicits._
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 11:00:00"), 102L), // tie on ts → max id wins
      (2L, ts("2024-01-01 12:00:00"), 200L)
    ).toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 11:00:00"), 900L), // equal ts → inclusive
      (1L, ts("2024-01-01 10:30:00"), 901L), // between views → 100
      (2L, ts("2024-01-01 11:59:59"), 902L), // before any view → null
      (3L, ts("2024-01-01 09:00:00"), 903L)  // user with no views → null
    ).toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asof(purchases, views, "user_id", "ts", "event_id",
      Seq("event_id"), Seq("event_id"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out(900L) == 102L) // inclusive at equal ts, tie → max id
    assert(out(901L) == 100L)
    assert(out(902L) == -1L)
    assert(out(903L) == -1L)
  }

  test("asof backward tolerance: stale matches become nulls") {
    import spark.implicits._
    val views = Seq((1L, ts("2024-01-01 08:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 08:30:00"), 900L),  // 30 min old → within 1h
      (1L, ts("2024-01-01 10:00:00"), 901L))  // 2h old → cut
      .toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asof(purchases, views, "user_id", "ts", "event_id",
      Seq("event_id"), Seq("event_id"), toleranceSeconds = Some(3600L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out(900L) == 100L)
    assert(out(901L) == -1L)
  }

  test("asofForward: inclusive boundary, earliest-next pick, tolerance") {
    import spark.implicits._
    val views = Seq(
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 11:00:00"), 100L), // tie on ts → min id wins
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 10:00:00"), 200L)
    ).toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 11:00:00"), 900L), // equal ts → inclusive
      (1L, ts("2024-01-01 11:30:00"), 901L), // next is 12:00 → 102
      (2L, ts("2024-01-01 10:00:01"), 902L), // after last view → null
      (1L, ts("2024-01-01 09:00:00"), 903L)  // next is 11:00, 2h away
    ).toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asofForward(purchases, views, "user_id", "ts",
      "event_id", Seq("event_id"), Seq("event_id"),
      toleranceSeconds = Some(3600L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out(900L) == 100L) // inclusive at equal ts, tie → min id
    assert(out(901L) == 102L)
    assert(out(902L) == -1L)
    assert(out(903L) == -1L)  // beyond the 1h tolerance
  }

  test("asofNearest: closer side wins, distance ties go backward, tolerance") {
    import spark.implicits._
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 201L)
    ).toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 10:30:00"), 900L), // 30m back vs 90m fwd → 100
      (1L, ts("2024-01-01 11:45:00"), 901L), // 105m back vs 15m fwd → 101
      (2L, ts("2024-01-01 10:00:00"), 902L), // 60m back vs 60m fwd → TIE → backward 200
      (2L, ts("2024-01-01 23:00:00"), 903L)  // only backward, 12h away
    ).toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asofNearest(purchases, views, "user_id", "ts",
      "event_id", Seq("event_id"), Seq("event_id"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out(900L) == 100L)
    assert(out(901L) == 101L)
    assert(out(902L) == 200L) // exact distance tie prefers backward
    assert(out(903L) == 201L)

    val bounded = AsofJoin.asofNearest(purchases, views, "user_id", "ts",
      "event_id", Seq("event_id"), Seq("event_id"),
      toleranceSeconds = Some(3600L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(bounded(903L) == -1L) // 12h match dies under a 1h tolerance
    assert(bounded(900L) == 100L)
  }

  test("native == composed under AQE with a skewed key (one user holds 50%)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // One hot user owns every second row — under AQE the exchanges
    // around this fixture coalesce and the hot key dominates one
    // partition. The native exec's required-distribution declaration
    // must keep each key's rows together through that re-plan; bit
    // equality with the window-composed formulation (whose
    // correctness the asof_join gate pins against DuckDB) proves it.
    def user(i: Int): Long = if (i % 2 == 0) 7L else (i % 97).toLong
    val views = (0 until 4000).map { i =>
      (user(i), new Timestamp(1700000000000L + (i * 7919L) % 86400000L),
        10000L + i)
    }.toDF("user_id", "ts", "event_id")
    val purchases = (0 until 2000).map { i =>
      (user(i), new Timestamp(1700000000000L + (i * 104729L) % 86400000L),
        90000L + i)
    }.toDF("user_id", "ts", "event_id")
    val composed = AsofJoin.asof(purchases, views, "user_id", "ts",
        "event_id", Seq("event_id"), Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("asof_event_id"), col("asof_ts"))
    val native = graft.plans.AsofJoinNative.join(purchases,
        views.select(col("user_id").as("v_user_id"),
          col("ts").as("asof_ts"), col("event_id").as("asof_event_id")),
        leftKey = "user_id", leftTime = "ts",
        rightKey = "v_user_id", rightTime = "asof_ts",
        rightTie = "asof_event_id")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("asof_event_id"), col("asof_ts"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val (c, n) = (canon(composed), canon(native))
    assert(c.nonEmpty && c.count(_.head == 7L) * 2 >= c.size) // skew is real
    assert(n == c)
  }
}
