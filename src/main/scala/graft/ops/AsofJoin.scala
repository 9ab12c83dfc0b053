package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (LEFT semantics: unmatched
  * left rows keep a null match). Spark has no native ASOF JOIN; the
  * idiomatic composition is union + one running `last(_, ignoreNulls)`
  * window:
  *
  *   1. tag both sides, union on (key, ts, tag, payload-struct) —
  *      right rows carry their payload, left rows carry null;
  *   2. window per key ordered by (ts, tag, id) with right(0) before
  *      left(1) at equal ts — "at or before" is inclusive, ties among
  *      right rows resolve to the greatest id (the LAST in frame);
  *   3. running `last(payload, ignoreNulls)` up to the current row;
  *   4. keep the left-tagged rows.
  *
  * Scale shape: ONE shuffle on the key + one sort — same cost as any
  * windowed aggregation; no range-bucketed self-join, no quadratic
  * candidate set. (Contrast [[graft.streaming.EventStreams
  * .intervalJoin]], which enumerates ALL pairs in a bounded range —
  * as-of keeps exactly one.)
  */
object AsofJoin {

  /** Generic as-of join. `leftPayload`/`rightPayload` are the columns
    * to carry through (key/ts come in addition); `rightPayload`
    * columns come back prefixed per `outPrefix`, null when no right
    * row is at or before the left row. `tieBreak` must be a
    * right-side column making equal-ts right rows deterministic. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieBreak: String, leftPayload: Seq[String],
      rightPayload: Seq[String], outPrefix: String = "asof_",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rStruct = struct(col(ts) +: (tieBreak +: rightPayload)
      .distinct.map(col): _*)
    val r = right.select(col(key), col(ts),
      col(tieBreak).cast(LongType).as("_tb"),
      lit(0).as("_side"), rStruct.as("_r"))
    val l = left.select(Seq(col(key), col(ts),
      lit(Long.MaxValue).as("_tb"), lit(1).as("_side"),
      lit(null).cast(r.schema("_r").dataType).as("_r")) ++
      leftPayload.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // allowMissingColumns: right rows get null left-payload columns
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      // Tolerance bounds the match age (pandas merge_asof semantics):
      // a right row older than ts - tolerance is no match at all.
      // Applied to the struct BEFORE extraction, so every payload
      // column nulls together.
      .withColumn("_m", toleranceSeconds.fold(col("_m"))(tol =>
        when(col("_m").getField(ts) >=
          col(ts) - expr(s"INTERVAL $tol SECONDS"), col("_m"))))
    val rightCols = (ts +: rightPayload.filterNot(_ == ts)).map(p =>
      col("_m").getField(p).as(s"$outPrefix$p"))
    matched.select(col(key) +: col(ts) +:
      (leftPayload.map(col) ++ rightCols): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with `right.ts >= left.ts` on the same key (the mirror of
    * [[asof]]; pandas `merge_asof(direction="forward")`). Equal-ts
    * right rows qualify; ties resolve to the smallest `tieBreak`.
    * Same one-shuffle, one-sort scale shape — the window frame simply
    * looks forward instead of back. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, tieBreak: String, leftPayload: Seq[String],
      rightPayload: Seq[String], outPrefix: String = "asof_",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rStruct = struct(col(ts) +: (tieBreak +: rightPayload)
      .distinct.map(col): _*)
    val r = right.select(col(key), col(ts),
      col(tieBreak).cast(LongType).as("_tb"),
      lit(1).as("_side"), rStruct.as("_r"))
    val l = left.select(Seq(col(key), col(ts),
      lit(Long.MinValue).as("_tb"), lit(0).as("_side"),
      lit(null).cast(r.schema("_r").dataType).as("_r")) ++
      leftPayload.map(col): _*)
    // Left (side 0) sorts BEFORE right at equal ts, so "at or after"
    // is inclusive; the forward frame takes the FIRST right payload.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .withColumn("_m", toleranceSeconds.fold(col("_m"))(tol =>
        when(col("_m").getField(ts) <=
          col(ts) + expr(s"INTERVAL $tol SECONDS"), col("_m"))))
    val rightCols = (ts +: rightPayload.filterNot(_ == ts)).map(p =>
      col("_m").getField(p).as(s"$outPrefix$p"))
    matched.select(col(key) +: col(ts) +:
      (leftPayload.map(col) ++ rightCols): _*)
  }

  /** Nearest as-of join (pandas `merge_asof(direction="nearest")`):
    * for each left row, the right row with the smallest |Δts| on the
    * same key — ties between directions go BACKWARD, ties within a
    * direction resolve like [[asof]]/[[asofForward]] (greatest
    * `tieBreak` backward, smallest forward).
    *
    * ONE shuffle, one sort — not "run both directions and join": the
    * right side enters the union twice (sorted before the left row
    * for the backward frame, after it for the forward frame, each
    * carrying its payload in its own column), so a single window sort
    * serves both a running `last` and a forward `first`, and the
    * direction pick is a pure projection. 2|R|+|L| sorted rows buys
    * the second direction without a second shuffle or a re-join on
    * left identity. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, tieBreak: String, leftPayload: Seq[String],
      rightPayload: Seq[String], outPrefix: String = "asof_",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rStruct = struct(col(ts) +: (tieBreak +: rightPayload)
      .distinct.map(col): _*)
    val rPre0 = right.select(col(key), col(ts),
      col(tieBreak).cast(LongType).as("_tb"),
      lit(-1).as("_side"), rStruct.as("_rb"))
    val rT = rPre0.schema("_rb").dataType
    val rPre = rPre0.withColumn("_rf", lit(null).cast(rT))
    val rPost = right.select(col(key), col(ts),
      col(tieBreak).cast(LongType).as("_tb"),
      lit(2).as("_side"), lit(null).cast(rT).as("_rb"),
      rStruct.as("_rf"))
    val l = left.select(Seq(col(key), col(ts),
      lit(0L).as("_tb"), lit(0).as("_side"),
      lit(null).cast(rT).as("_rb"), lit(null).cast(rT).as("_rf")) ++
      leftPayload.map(col): _*)
    val order = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
    val back = order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    def bound(m: Column, cmp: Column => Column): Column =
      toleranceSeconds.fold(m)(tol => when(m.isNotNull &&
        cmp(m.getField(ts)), m))
    val picked = l.unionByName(rPre.unionByName(rPost),
        allowMissingColumns = true)
      .withColumn("_b", last(col("_rb"), ignoreNulls = true).over(back))
      .withColumn("_f", first(col("_rf"), ignoreNulls = true).over(fwd))
      .filter(col("_side") === 0)
      .withColumn("_b", bound(col("_b"), bts =>
        bts >= col(ts) - expr(s"INTERVAL ${toleranceSeconds.getOrElse(0L)} SECONDS")))
      .withColumn("_f", bound(col("_f"), fts =>
        fts <= col(ts) + expr(s"INTERVAL ${toleranceSeconds.getOrElse(0L)} SECONDS")))
      .withColumn("_m",
        when(col("_b").isNull, col("_f"))
          .when(col("_f").isNull, col("_b"))
          .when(unix_micros(col(ts)) - unix_micros(col("_b").getField(ts))
            <= unix_micros(col("_f").getField(ts)) - unix_micros(col(ts)),
            col("_b"))
          .otherwise(col("_f")))
    val rightCols = (ts +: rightPayload.filterNot(_ == ts)).map(p =>
      col("_m").getField(p).as(s"$outPrefix$p"))
    picked.select(col(key) +: col(ts) +:
      (leftPayload.map(col) ++ rightCols): _*)
  }

  // ---------------------------------------------------------------- //

  /** Gate query: each purchase as-of joined to the same user's latest
    * prior (or simultaneous) view. */
  def purchaseAsofView(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    asof(purchases, views, "user_id", "ts", "event_id",
      leftPayload = Seq("event_id"), rightPayload = Seq("event_id"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("asof_event_id").as("view_id"),
        col("asof_ts").as("view_ts"))
      .orderBy(col("purchase_id"))
  }

  val purchaseAsofViewSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts,
      |  v.event_id AS view_id, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      |  SELECT event_id, ts FROM events v
      |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |    AND v.ts <= p.ts
      |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v ON true
      |ORDER BY purchase_id""".stripMargin

  /** Gate query: each purchase forward-joined to the same user's
    * NEXT view within one hour — direction and tolerance together. */
  def purchaseNextView(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofForward(purchases, views, "user_id", "ts", "event_id",
      leftPayload = Seq("event_id"), rightPayload = Seq("event_id"),
      toleranceSeconds = Some(3600L))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("asof_event_id").as("view_id"),
        col("asof_ts").as("view_ts"))
      .orderBy(col("purchase_id"))
  }

  val purchaseNextViewSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts,
      |  v.event_id AS view_id, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      |  SELECT event_id, ts FROM events v
      |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |    AND v.ts >= p.ts AND v.ts <= p.ts + INTERVAL 1 HOUR
      |  ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) v ON true
      |ORDER BY purchase_id""".stripMargin

  /** Gate query: each purchase joined to the temporally NEAREST view
    * in either direction (distance ties go backward — the pandas
    * convention). */
  def purchaseNearestView(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofNearest(purchases, views, "user_id", "ts", "event_id",
      leftPayload = Seq("event_id"), rightPayload = Seq("event_id"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("asof_event_id").as("view_id"),
        col("asof_ts").as("view_ts"))
      .orderBy(col("purchase_id"))
  }

  /** LATERAL oracle: distance ascending, backward preferred on ties,
    * in-direction ties mirror the engine's (greatest id backward,
    * smallest forward) via the sign-flipped id key. */
  val purchaseNearestViewSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts,
      |  v.event_id AS view_id, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      |  SELECT event_id, ts FROM events v
      |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |  ORDER BY
      |    CASE WHEN v.ts <= p.ts THEN epoch_us(p.ts) - epoch_us(v.ts)
      |         ELSE epoch_us(v.ts) - epoch_us(p.ts) END ASC,
      |    (v.ts > p.ts) ASC,
      |    CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END ASC
      |  LIMIT 1) v ON true
      |ORDER BY purchase_id""".stripMargin

  /** [[purchaseAsofView]] through the NATIVE operator
    * ([[graft.plans.AsofJoinPlan]] → AsofJoinExec): custom logical
    * node, planner strategy, and a per-partition streaming merge
    * with O(1) state instead of the union + running-window
    * composition. Same oracle as `asof_join` — identical answers
    * from both formulations is the operator's correctness contract. */
  def purchaseAsofViewNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.plans.AsofJoinNative.join(purchases, views,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "v_user_id", rightTime = "view_ts", rightTie = "view_id")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("view_id"), col("view_ts"))
      .orderBy(col("purchase_id"))
  }

  /** [[purchaseNextView]] (forward direction + 1 h tolerance) through
    * the native operator — the head-of-stream merge case: the
    * earliest at-or-after right row is the lookahead itself. */
  def purchaseNextViewNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.plans.AsofJoinNative.join(purchases, views,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "v_user_id", rightTime = "view_ts", rightTie = "view_id",
      direction = "forward", toleranceMicros = Some(3600L * 1000000L))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("view_id"), col("view_ts"))
      .orderBy(col("purchase_id"))
  }

  /** [[purchaseNearestView]] through the native operator — one merge
    * pass yields BOTH candidates (backward best + the un-consumed
    * forward lookahead); the direction pick is a two-long compare. */
  def purchaseNearestViewNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.plans.AsofJoinNative.join(purchases, views,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "v_user_id", rightTime = "view_ts", rightTie = "view_id",
      direction = "nearest")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts"), col("view_id"), col("view_ts"))
      .orderBy(col("purchase_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> (purchaseAsofView _),
    "asof_join_native" -> (purchaseAsofViewNative _),
    "asof_join_forward_native" -> (purchaseNextViewNative _),
    "asof_join_nearest_native" -> (purchaseNearestViewNative _),
    "asof_join_forward" -> (purchaseNextView _),
    "asof_join_nearest" -> (purchaseNearestView _))

  def oracle: Map[String, String] = Map(
    "asof_join" -> purchaseAsofViewSql,
    "asof_join_native" -> purchaseAsofViewSql,
    "asof_join_forward_native" -> purchaseNextViewSql,
    "asof_join_nearest_native" -> purchaseNearestViewSql,
    "asof_join_forward" -> purchaseNextViewSql,
    "asof_join_nearest" -> purchaseNearestViewSql)
}
