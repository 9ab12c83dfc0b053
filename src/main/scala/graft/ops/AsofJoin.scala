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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> (purchaseAsofView _),
    "asof_join_forward" -> (purchaseNextView _))

  def oracle: Map[String, String] = Map(
    "asof_join" -> purchaseAsofViewSql,
    "asof_join_forward" -> purchaseNextViewSql)
}
