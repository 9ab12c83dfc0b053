package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Relational query surface (SURVEY.md §2.5): scans, filters,
  * projections, joins (inner/outer/semi/anti/broadcast), aggregations
  * (incl. distinct, rollup/cube), windows, sorts/limits, set ops —
  * expressed with `org.apache.spark.sql` built-ins so Catalyst gets a
  * fully declarative plan (predicate pushdown, column pruning, join
  * selection, AQE all apply).
  *
  * Determinism policy (the DuckDB-oracle gate hashes values):
  *   - Sums over `double` columns go through `DECIMAL(18,s)` casts —
  *     decimal addition is associative, so Spark's partial aggregation
  *     and DuckDB's single-threaded sum agree bit-for-bit; the final
  *     value is cast back to DOUBLE so both engines emit float64.
  *   - Averages are written as exact-decimal-sum / count in both
  *     engines (one IEEE division — deterministic).
  *   - Every query ends in a total ORDER BY over its key columns; the
  *     oracle SQL orders by the same keys with NULLS FIRST (Spark's
  *     default ASC null ordering).
  */
object Relational {

  /** Exact (decimal-space) sum of a double column, emitted as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact-sum average: deterministic across engines. */
  private def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  // ---------------------------------------------------------------- //

  /** TPC-H Q1-style pricing summary: scan → filter → hash aggregate.
    * At scale: partial (map-side) aggregation on 6 grouping values
    * means the shuffle carries O(groups × partitions) rows, not data.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection with computed columns — Catalyst pushes the
    * predicate and the 4-column read schema into the parquet scan. */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_quantity") > lit(45.0) && col("l_discount") >= lit(0.05))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)).cast(DoubleType).as("net_price"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
      |  l_returnflag
      |FROM lineitem
      |WHERE l_quantity > 45.0 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3-style shipping-priority: 3-way join + agg + top-k.
    * customer is small → broadcast; orders⋈lineitem shuffles on the
    * join key, which is also the grouping key, so the aggregation
    * reuses the join's partitioning (no extra shuffle).
    */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1996-03-15").cast(TimestampType))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1996-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q4-style: EXISTS via left-semi join, then count by group. */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1996-06-01").cast(TimestampType))
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > TIMESTAMP '1996-06-01')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Anti join: customers with no orders since 2000 (NOT EXISTS). */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q5Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q6-style forecast revenue: tight range filter → single
    * global sum. Fully pushed down; one-row result. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project"  -> (q2FilterProject _),
    "q3_top_revenue"     -> (q3TopRevenue _),
    "q4_semi_join"       -> (q4SemiJoin _),
    "q5_anti_join"       -> (q5AntiJoin _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _))

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project"  -> q2Sql,
    "q3_top_revenue"     -> q3Sql,
    "q4_semi_join"       -> q4Sql,
    "q5_anti_join"       -> q5Sql,
    "q6_forecast_revenue" -> q6Sql)
}
