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

  /** Left outer join with per-customer aggregates (zero-filled). */
  def q7OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  val q7Sql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  /** Window: top-3 orders per customer by price (deterministic
    * tiebreak on orderkey). One shuffle on the partition key. */
  def q8WindowRank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q8Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Window: running decimal-exact sum + lag per supplier. */
  def q9WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 10)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    l.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        sum(col("l_quantity").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_qty"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
               col("l_linenumber"))
  }

  val q9Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w2 AS DOUBLE) AS running_qty,
      |  LAG(l_quantity, 1) OVER w AS prev_qty
      |FROM lineitem
      |WHERE l_suppkey <= 10
      |WINDOW
      |  w AS (PARTITION BY l_suppkey
      |        ORDER BY l_shipdate, l_orderkey, l_linenumber),
      |  w2 AS (PARTITION BY l_suppkey
      |         ORDER BY l_shipdate, l_orderkey, l_linenumber
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  /** Join + agg + top-k: 20 biggest customers by order value. */
  def q10TopSpenders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    o.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"),
              col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY total_spent DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Distinct aggregates (exact): per return flag.
    *
    * Deliberately NOT `agg(countDistinct, countDistinct, ...)`: three
    * distincts in one aggregate force Catalyst's Expand — every input
    * row is tripled (one copy per gid) before the partial aggregate,
    * the known multi-distinct cost amplifier at 100 TB. Instead each
    * distinct runs as its own scan branch (parquet reads exactly the
    * 2-3 columns it needs), deduped by a map-side-combinable partial
    * aggregate so the shuffle carries only distinct (flag, key) pairs,
    * then the three 3-row results broadcast-join back together. One
    * job, three concurrent stages, no row multiplication anywhere.
    * (`q37_approx_distinct` is the single-scan sketch alternative.) */
  def q11DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    def branch(keys: Seq[Column], as: String): DataFrame =
      l.select(col("l_returnflag") +: keys: _*).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    branch(Seq(col("l_partkey")), "n_parts")
      .join(broadcast(branch(Seq(col("l_suppkey")), "n_supps")),
        "l_returnflag")
      .join(broadcast(
          branch(Seq(col("l_orderkey"), col("l_linenumber")), "n_lines")),
        "l_returnflag")
      .orderBy(col("l_returnflag"))
  }

  val q11Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Set operations: nation keys by membership class. */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
    val both    = cn.intersect(sn).withColumn("cls", lit("both"))
    val custOnly = cn.except(sn).withColumn("cls", lit("customer_only"))
    val either  = cn.union(sn).distinct().withColumn("cls", lit("either"))
    both.union(custOnly).union(either)
      .orderBy(col("cls"), col("nk"))
  }

  val q12Sql: String =
    """SELECT nk, cls FROM (
      |  SELECT nk, 'both' AS cls FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nk, 'customer_only' AS cls FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nk, 'either' AS cls FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     UNION SELECT s_nationkey FROM supplier))
      |ORDER BY cls, nk""".stripMargin

  /** ROLLUP: order counts/totals at (status, priority), (status), (). */
  def q13Rollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)
  }

  val q13Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** CUBE over (returnflag, linestatus). */
  def q14Cube(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }

  val q14Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CASE/WHEN bucketing + conditional aggregation. */
  def q15CaseBucket(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val tier = when(col("o_totalprice") < 1000.0, "small")
      .when(col("o_totalprice") < 10000.0, "medium")
      .otherwise("large")
    o.groupBy(tier.as("tier"))
      .agg(count(lit(1)).as("n"),
           count(when(col("o_orderstatus") === "O", 1)).as("n_open"))
      .orderBy(col("tier"))
  }

  val q15Sql: String =
    """SELECT CASE WHEN o_totalprice < 1000.0 THEN 'small'
      |            WHEN o_totalprice < 10000.0 THEN 'medium'
      |            ELSE 'large' END AS tier,
      |  COUNT(*) AS n,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
      |FROM orders
      |GROUP BY 1
      |ORDER BY tier""".stripMargin

  /** String functions: upper/substring/length/concat/LIKE. */
  def q16StringFuncs(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    p.filter(col("p_type").like("%ECO%") || col("p_name").like("s%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_brand"), 1, 5).as("brand5"),
        length(col("p_type")).cast(LongType).as("type_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))
  }

  val q16Sql: String =
    """SELECT p_partkey, UPPER(p_name) AS uname,
      |  SUBSTRING(p_brand, 1, 5) AS brand5,
      |  CAST(LENGTH(p_type) AS BIGINT) AS type_len,
      |  CONCAT_WS('/', p_brand, p_type) AS brand_type
      |FROM part
      |WHERE p_type LIKE '%ECO%' OR p_name LIKE 's%'
      |ORDER BY p_partkey""".stripMargin

  /** Date bucketing: revenue per calendar month. */
  def q17DateBuckets(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.groupBy(
        date_trunc("month", col("l_shipdate")).as("ship_month"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(dsum(col("l_extendedprice")).as("revenue"),
           count(lit(1)).as("n"))
      .orderBy(col("ship_month"))
  }

  val q17Sql: String =
    """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
      |  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY ship_month""".stripMargin

  /** TPC-H Q17-style: rows below 20% of their part's average quantity.
    * The per-part aggregate is tiny relative to lineitem → AQE
    * broadcasts it; avg is computed identically on both sides. */
  def q18AvgSubquery(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val avgPerPart = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    l.join(broadcast(avgPerPart), col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("total_price"),
           count(lit(1)).as("n_rows"))
  }

  val q18Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS ap_partkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      |      FROM lineitem GROUP BY 1) a
      |  ON l.l_partkey = a.ap_partkey
      |WHERE l.l_quantity < 0.2 * a.avg_qty""".stripMargin

  /** GROUP BY ... HAVING via post-aggregation filter. */
  def q19Having(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.groupBy(col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))
      .filter(col("sum_qty") > 100.0)
      .orderBy(col("l_suppkey"))
  }

  val q19Sql: String =
    """SELECT l_suppkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 100.0
      |ORDER BY l_suppkey""".stripMargin

  /** Cross join (small × small): region × order-status matrix. */
  def q20CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val st = Tables.orders(s, dir).select(col("o_orderstatus")).distinct()
    r.crossJoin(st)
      .select(col("r_regionkey"), col("r_name"), col("o_orderstatus"))
      .orderBy(col("r_regionkey"), col("o_orderstatus"))
  }

  val q20Sql: String =
    """SELECT r_regionkey, r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      |ORDER BY r_regionkey, o_orderstatus""".stripMargin

  /** NULL semantics: NULLIF/COALESCE/IS NULL counting. */
  def q21NullHandling(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val masked = o.withColumn("status_nn",
      nullif(col("o_orderstatus"), lit("O")))
    masked.groupBy(coalesce(col("status_nn"), lit("~none~")).as("status"))
      .agg(count(lit(1)).as("n"),
           count(col("status_nn")).as("n_not_null"),
           sum(when(col("status_nn").isNull, 1L).otherwise(0L)).as("n_null"))
      .orderBy(col("status"))
  }

  val q21Sql: String =
    """SELECT COALESCE(NULLIF(o_orderstatus, 'O'), '~none~') AS status,
      |  COUNT(*) AS n,
      |  COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_null,
      |  CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      |FROM orders
      |GROUP BY 1
      |ORDER BY status""".stripMargin

  /** Scalar math: abs/floor/ceil/sqrt/modulo (IEEE-deterministic). */
  def q22ScalarMath(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).filter(col("l_orderkey") <= 100)
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_disc"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q22Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  ABS(l_discount - 0.05) AS abs_disc,
      |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
      |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
      |  SQRT(l_quantity) AS sqrt_qty,
      |  l_orderkey % 7 AS mod7
      |FROM lineitem
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Exact percentiles — the OPT-IN variant. `percentile` buffers
    * every group's values in the aggregation buffer, so as a global
    * or low-cardinality-group percentile at 100 TB it is an
    * executor-memory scale-killer. The DEFAULT for this shape of ask
    * is [[q23PercentilesApprox]] (`percentile_approx`: a mergeable
    * sketch, bounded memory, map-side combinable — same quantiles,
    * tolerance-gated); reach for the exact form only when the
    * groups are known to fit (it is the oracle-checkable baseline
    * here). Both engines use the same (1-d)·lower + d·upper
    * interpolation; results are rounded to 4 decimals on both sides
    * to absorb the one floating-point interpolation step. */
  def q23Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      // one percentile aggregate with an array argument — buffers the
      // group's values once, not once per requested quantile
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
        .as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p50"),
        round(element_at(col("ps"), 2), 4).as("p90"),
        round(element_at(col("ps"), 3), 4).as("p99"))
      .orderBy(col("l_returnflag"))

  val q23Sql: String =
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Approximate percentiles — the 100 TB DEFAULT for q23's ask.
    * `percentile_approx` keeps a bounded mergeable sketch per group
    * (accuracy 10000 ≈ 0.01% rank error) instead of buffering every
    * value, so memory is O(sketch) regardless of group size and the
    * aggregation combines map-side. The gate computes the same three
    * quantiles both ways and emits per-group relative-error booleans
    * (tolerance 1%) — hash-checkable constants for the oracle, same
    * discipline as q37's sketch gates. */
  def q23PercentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr(
        "percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
        .as("aps"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
        .as("eps"))
    def ok(i: Int) = (abs(element_at(col("aps"), i).cast(DoubleType)
        - element_at(col("eps"), i))
      / element_at(col("eps"), i) <= 0.01)
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"),
        ok(1).as("p50_ok"), ok(2).as("p90_ok"), ok(3).as("p99_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q23ApproxSql: String =
    """SELECT l_returnflag,
      |  true AS p50_ok, true AS p90_ok, true AS p99_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Pivot: line status columns per return flag (conditional
    * aggregation under the hood — one pass, no extra shuffle beyond
    * the groupBy). */
  def q24Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .orderBy(col("l_returnflag"))

  val q24Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Cohort retention over `events`: users cohorted by first-activity
    * week, distinct active users per (cohort, week offset). Two
    * aggregations + one join, all keyed on user_id/cohort — the join
    * reuses the first aggregation's partitioning, and the final
    * distinct-count shuffles only (cohort, offset, user_id). */
  def q25CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort"))
    val active = e.distinct()
    active.join(cohorts, "user_id")
      .select(col("cohort").cast(DateType).as("cohort_week"),
        (datediff(col("week"), col("cohort")) / 7)
          .cast(IntegerType).as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q25Sql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort FROM weekly GROUP BY user_id)
      |SELECT CAST(c.cohort AS DATE) AS cohort_week,
      |  CAST(date_diff('day', c.cohort, w.week) / 7 AS INTEGER)
      |    AS week_offset,
      |  COUNT(DISTINCT w.user_id) AS n_users
      |FROM weekly w JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Window-function breadth: lag/lead/first_value/ntile per user
    * timeline (deterministic window order via the unique event_id
    * tiebreak). */
  def q26WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_type")).over(w).as("first_type"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q26Sql: String =
    """SELECT user_id, event_id,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  first_value(event_type) OVER w AS first_type,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |FROM events
      |WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Semi-structured extraction: JSON props column → typed value,
    * aggregated. The JSON path evaluates inside the scan projection —
    * at 100 TB the string column is read once, parsed once per row,
    * and only (event_type, k) survives to the shuffle. */
  def q27JsonExtract(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q27Sql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(props->>'k' AS BIGINT)) AS n_k,
      |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL): duplicates
    * count — `orders` has multiple orders per customer, so the bag
    * results differ from the distinct q12 variants. */
  def q28SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val co = Tables.orders(s, dir).select(col("o_custkey").as("k"))
    val cc = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val exceptAll = co.exceptAll(cc).withColumn("op", lit("except_all"))
    val intersectAll = co.intersectAll(cc)
      .withColumn("op", lit("intersect_all"))
    exceptAll.union(intersectAll)
      .groupBy(col("op"), col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("op"), col("k"))
  }

  val q28Sql: String =
    """SELECT op, k, COUNT(*) AS n FROM (
      |  SELECT 'except_all' AS op, k FROM (
      |    SELECT o_custkey AS k FROM orders
      |    EXCEPT ALL
      |    SELECT c_custkey AS k FROM customer)
      |  UNION ALL
      |  SELECT 'intersect_all' AS op, k FROM (
      |    SELECT o_custkey AS k FROM orders
      |    INTERSECT ALL
      |    SELECT c_custkey AS k FROM customer))
      |GROUP BY op, k
      |ORDER BY op, k""".stripMargin

  /** Explicit GROUPING SETS with grouping_id — finer than rollup/cube
    * (q13/q14): exactly the (flag,status), (flag), () combinations,
    * with the grouping level surfaced as a column. */
  def q29GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        grouping_id().cast(LongType).as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q29Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Ordered string aggregation (LISTAGG-style): per nation, the
    * sorted distinct market segments of its customers. `collect_set`
    * is order-nondeterministic under parallel merge, so the plan
    * sorts the array before joining — the only way a string agg can
    * be hash-stable on a cluster. */
  def q30StringAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  val q30Sql: String =
    """SELECT n_name,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments,
      |  COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries, run through
    * `spark.sql` over temp views so the exact oracle text executes on
    * both engines. Catalyst rewrites the subqueries into left-semi /
    * left-anti hash joins (RewritePredicateSubquery) — no per-row
    * re-execution, one shuffle each on o_custkey. */
  def q31ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q31Sql)
  }

  val q31Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'O')
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_totalprice > 400000.0)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Single-pass statistical moments: covariance / correlation /
    * stddev from decimal power sums (n, Σx, Σy, Σx², Σy², Σxy). The
    * naive two-pass mean-then-deviation plan reads the data twice; the
    * power-sum form is one map-side-combinable aggregation — at 100 TB
    * the shuffle carries 6 numbers per group. Decimal sums make the
    * partial-merge order irrelevant; the float math on top is a fixed
    * scalar expression, identical in both engines. */
  def q32StatsMoments(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(18, 2))
    val y = col("l_extendedprice").cast(DecimalType(18, 2))
    val cv = (col("sxy") - col("sx") * col("sy") / col("n")) / col("n")
    val sdx = sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"))
    val sdy = sqrt((col("syy") - col("sy") * col("sy") / col("n")) / col("n"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"),
        sum(x * y).cast(DoubleType).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        cv.as("covar_pop"), sdx.as("stddev_x"),
        // the correlation RATIO divides two products of rounded
        // doubles — the one place a final-ULP wobble between engines
        // can surface (observed at sf0.001); 12 dp keeps ~5 digits of
        // slack beyond it
        round(cv / (sdx * sdy), 12).as("corr_xy"))
      .orderBy(col("l_returnflag"))
  }

  val q32Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (sxy - sx * sy / n) / n AS covar_pop,
      |  sqrt((sxx - sx * sx / n) / n) AS stddev_x,
      |  round(((sxy - sx * sy / n) / n)
      |    / (sqrt((sxx - sx * sx / n) / n) * sqrt((syy - sy * sy / n) / n)), 12) AS corr_xy
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Time-interval RANGE frame: per-customer 30-day moving order
    * total (frame bounded by value distance on the epoch-millis sort
    * key, not row count), plus percent_rank/cume_dist — rank-based,
    * so tie-safe. One shuffle on o_custkey serves all four windows. */
  def q33RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    val wt = Window.partitionBy(col("o_custkey"))
      .orderBy((col("o_orderdate").cast(TimestampType).cast(LongType)
        * 1000L).as("odate_ms"))
      .rangeBetween(-30L * dayMs, 0L)
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
    Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wt)
          .cast(DoubleType).as("moving_30d_total"),
        count(lit(1)).over(wt).as("n_in_window"),
        percent_rank().over(wr).as("pr"),
        cume_dist().over(wr).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  val q33Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
      |    RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_30d_total,
      |  COUNT(*) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
      |    RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS n_in_window,
      |  percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pr,
      |  cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cd
      |FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin

  /** Binned range join: for each purchase event, count/sum all events
    * in the preceding 10 minutes. A pure non-equi join is a
    * BroadcastNestedLoopJoin in Spark — O(probe × build), hopeless at
    * 100 TB. Binning the time axis at the window width and exploding
    * the probe side into its two covering buckets turns it into an
    * equi shuffle join on the bucket id (each matching pair lands in
    * exactly one bucket, so no dedup pass is needed); the residual
    * range predicate filters within buckets. The oracle states the
    * same join un-binned — equality proves the rewrite lossless. */
  def q34RangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    val binSec = 600L
    val ev = Tables.events(s, dir)
    val bucket = (t: Column) => floor(t.cast(LongType) / binSec)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withColumn("pb", explode(array(
        bucket(col("p_ts")), bucket(col("p_ts")) - 1)))
    val others = ev.select(col("event_id").as("o_id"), col("ts").as("o_ts"),
        col("value").as("o_value"))
      .withColumn("ob", bucket(col("o_ts")))
    purchases.join(others,
        col("pb") === col("ob") &&
        col("o_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("o_ts") < col("p_ts"), "left")
      .groupBy(col("p_id"))
      .agg(count(col("o_id")).as("n_prior"),
        sum(col("o_value").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("prior_value"))
      .orderBy(col("p_id"))
  }

  val q34Sql: String =
    """SELECT a.event_id AS p_id, COUNT(b.event_id) AS n_prior,
      |  CAST(SUM(CAST(b.value AS DECIMAL(18,4))) AS DOUBLE) AS prior_value
      |FROM events a LEFT JOIN events b
      |  ON b.ts >= a.ts - INTERVAL 10 MINUTE AND b.ts < a.ts
      |WHERE a.event_type = 'purchase'
      |GROUP BY a.event_id
      |ORDER BY a.event_id""".stripMargin

  /** UNPIVOT (melt): wide per-flag measure columns back to long
    * (measure, value) rows with the native `Dataset.unpivot` — the
    * inverse of q24's pivot. Generated, not shuffled: unpivot is a
    * projection (each input row expands to k output rows). */
  def q35Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_tax"), 4).as("sum_tax"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_tax")),
        "measure", "val")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  val q35Sql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS sum_tax
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, val FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_tax', sum_tax FROM wide)
      |ORDER BY l_returnflag, measure""".stripMargin

  /** Semi-structured props through Spark 4's VariantType: parse once,
    * extract typed paths with variant_get. Variant's binary encoding
    * is decoded lazily per path — at scale this beats re-parsing JSON
    * text per extraction (q27's get_json_object path). Same oracle
    * semantics as q27, different (variant) execution path. */
  def q36Variant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q36Sql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(props->>'k' AS BIGINT)) AS n_k,
      |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Approximate sketches — the 100 TB alternatives to q11's exact
    * multi-distinct (which forces Catalyst's Expand row-tripling) and
    * q23's exact percentile (which buffers every group's values).
    * `approx_count_distinct` (HLL++, rsd 0.01) and `percentile_approx`
    * (mergeable rank sketch) are both single-pass, fixed-memory,
    * map-combinable — one scan, no Expand, no value buffering.
    *
    * Oracle design: sketch outputs differ across engines by
    * construction, so the gate hash-matches the EXACT values and
    * asserts the approximate ones land within tolerance as booleans
    * (DuckDB emits literal `true`). Deterministic per dataset: the
    * sketches have no RNG, so a local pass is a driver pass. */
  def q37ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    // The sketch side — what this gate exists to certify — is ONE
    // single-pass fixed-memory aggregate. The exact reference values
    // ride in separate branches (Expand-free distinct-then-count +
    // a percentile-only aggregate) so the sketch plan is never
    // entangled with Catalyst's multi-phase distinct rewrite or the
    // exact percentile's value buffers (a 12× slowdown when all four
    // shared one Aggregate).
    val sketch = l.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap_parts"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)")
          .as("ap_p50"))
    val exactDistinct = l.select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_parts_exact"))
    val exactP50 = l.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
    sketch
      .join(broadcast(exactDistinct), "l_returnflag")
      .join(broadcast(exactP50), "l_returnflag")
      .select(col("l_returnflag"),
        col("n_parts_exact"),
        (abs(col("ap_parts").cast(DoubleType) - col("n_parts_exact"))
          / col("n_parts_exact") <= 0.05).as("parts_approx_ok"),
        round(col("p50_exact"), 4).as("p50_exact"),
        (abs(col("ap_p50") - col("p50_exact")) / col("p50_exact") <= 0.01)
          .as("p50_approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q37Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts_exact,
      |  true AS parts_approx_ok,
      |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
      |  true AS p50_approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Trailing-window DISTINCT count — "distinct customers in the last
    * 7 days, per order day" — WITHOUT the global unpartitioned window
    * that `COUNT(DISTINCT) OVER (ORDER BY day RANGE ...)` would cost
    * (Spark moves the whole table to one partition for a window with
    * no PARTITION BY, and doesn't support DISTINCT in window frames
    * anyway).
    *
    * Plan shape: pre-distinct to (day, customer) pairs (map-side
    * combinable), fan each pair out to the w=7 trailing days it
    * contributes to, then a day-keyed distinct count. Every shuffle is
    * keyed by calendar day — thousands of keys regardless of table
    * size — and the fan-out multiplies the DISTINCT pair count, not
    * the row count. At 100 TB the same shape holds; for wide windows
    * (w in the hundreds) swap the fan-out for per-day HLL sketches
    * merged over the frame — q37 certifies that sketch path.
    */
  def q38RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val dayCust = Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("d"),
        col("o_custkey").as("c"))
      .distinct()
    val counts = dayCust
      .withColumn("k", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("d"), col("k")).as("order_day"), col("c"))
      .groupBy(col("order_day"))
      .agg(countDistinct(col("c")).as("n_cust_7d"))
    // Report only days that actually had orders (the fan-out also
    // lands on up-to-6 trailing ghost days past each real day).
    counts.join(dayCust.select(col("d").as("order_day")).distinct(),
        "order_day")
      .orderBy(col("order_day"))
  }

  val q38Sql: String =
    """WITH dc AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey AS c
      |  FROM orders),
      |cov AS (SELECT d + CAST(k AS INTEGER) AS order_day, c
      |        FROM dc, (SELECT unnest(range(0, 7)) AS k) r),
      |cnt AS (SELECT order_day, COUNT(DISTINCT c) AS n_cust_7d
      |        FROM cov GROUP BY order_day)
      |SELECT cnt.order_day, cnt.n_cust_7d
      |FROM cnt JOIN (SELECT DISTINCT d FROM dc) a ON cnt.order_day = a.d
      |ORDER BY order_day""".stripMargin

  /** Sketch-rollup table — THE 100 TB distinct-count architecture:
    * materialize mergeable HLL sketches once at the finest grain
    * (per event-type × day), then answer any coarser rollup
    * (type-level here; weekly / all-time identically) by MERGING
    * sketches — the raw corpus is never rescanned. Because an HLL
    * union takes the register-wise max, merging the daily sketches
    * is LOSSLESS: the gate proves `estimate(union(daily)) ==
    * estimate(sketch(direct))` per type, and that the estimate lands
    * within 5% of the exact count (Datasketches HLL, lgK=12 →
    * ~1.6% RSE). Booleans + the exact anchor are what the oracle
    * hash-checks — the property is deterministic, same discipline as
    * the ANN recall gates.
    *
    * Scale: daily sketch build is one map-side-combined aggregate
    * (sketches merge in the combiner); the rollup shuffles only
    * types × days sketch BLOBS (≤4 KB each), not rows. countDistinct
    * here is the sf-sized anchor only — at 100 TB you'd trust the
    * sketch, which is the point. */
  def q41SketchRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("est_merged"))
    val direct = ev.groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("est_direct"),
        countDistinct(col("user_id")).as("n_exact"))
    merged.join(direct, "event_type")
      .select(col("event_type"), col("n_exact"),
        (col("est_merged") === col("est_direct"))
          .as("merge_consistent"),
        (abs(col("est_merged") - col("n_exact")) * lit(20L) <=
          col("n_exact")).as("within_5pct"))
      .orderBy(col("event_type"))
  }

  val q41Sql: String =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_exact,
      |  TRUE AS merge_consistent,
      |  TRUE AS within_5pct
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Array higher-order functions over the embedding column —
    * `transform` / `filter` / `aggregate` (fold) / `zip_with` /
    * `reverse` / `array_max`, the codegen'd lambda surface that keeps
    * vector math INSIDE whole-stage codegen instead of a UDF (the
    * same machinery [[Similarity]] builds its kernels from; this gate
    * pins the HOF semantics directly). Values are quantized to
    * integer thousandths FIRST (`floor(x·1000)` — identical in both
    * engines), so every downstream fold is exact integer arithmetic
    * with no float-association hazard.
    *
    * Scale: pure per-row projection — no shuffle at all beyond the
    * final presentation sort. */
  def q42ArrayHof(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 200)
      .withColumn("q", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))"))
      .select(col("vec_id"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").as("norm2q"),
        expr("size(filter(q, x -> x > 0))").cast(LongType).as("n_pos"),
        expr("aggregate(zip_with(q, reverse(q), (a, b) -> a * b), " +
          "0L, (acc, x) -> acc + x)").as("rev_dotq"),
        expr("array_max(q)").as("maxq"))
      .orderBy(col("vec_id"))
  }

  val q42Sql: String =
    """WITH t AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings WHERE vec_id < 200)
      |SELECT vec_id,
      |  CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
      |    AS norm2q,
      |  CAST(len(list_filter(q, x -> x > 0)) AS BIGINT) AS n_pos,
      |  CAST(list_sum(list_transform(range(1, len(q) + 1),
      |    i -> q[i] * q[len(q) - i + 1])) AS BIGINT) AS rev_dotq,
      |  CAST(list_max(q) AS BIGINT) AS maxq
      |FROM t ORDER BY vec_id""".stripMargin

  /** Window-function family completion — the offset/positional
    * functions q8/q9/q26/q33 don't touch: `nth_value` over the full
    * frame, `last_value` with an explicit full frame (the classic
    * default-frame trap — RANGE … CURRENT ROW would return the
    * current row), `lag` with an offset of 2 and a non-null default,
    * and `first_value(… IGNORE NULLS)` skipping planted NULLs. One
    * per-customer window sort serves all five expressions.
    */
  def q43WindowFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        lag(col("o_orderkey"), 2, -1L).over(w).as("lag2_key"),
        first(when(col("o_orderstatus") =!= "O", col("o_orderkey")),
          ignoreNulls = true).over(full).as("first_closed"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q43Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  lag(o_orderkey, 2, -1) OVER w AS lag2_key,
      |  first_value(CASE WHEN o_orderstatus <> 'O'
      |    THEN o_orderkey END IGNORE NULLS) OVER wf AS first_closed
      |FROM orders
      |WHERE o_custkey < 200
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Null-aware anti join — ANSI `NOT IN (subquery)` three-valued
    * semantics, the join variant a plain `left_anti` CANNOT express:
    * one NULL in the subquery makes `x NOT IN S` unknown for every x,
    * so the result collapses to empty. Two probes in one gate: a
    * NULL-free subquery (ordinary anti-join answer) and the same
    * subquery with NULLs planted (must return 0). Same SQL text runs
    * on both engines.
    *
    * Scale: Catalyst plans this as a broadcast null-aware anti join
    * (`spark.sql.optimizer.enableNullAwareAntiJoin`, on by default) —
    * the subquery side broadcasts with a has-null flag, the probe
    * stays a streamed hash lookup; without it the fallback is a
    * nested-loop, which is why the gate pins the semantics the
    * optimized path must preserve. */
  def q39NullAntiJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q39Sql)
  }

  val q39Sql: String =
    """SELECT 'no_null' AS probe, COUNT(*) AS n
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT 'with_null' AS probe, COUNT(*) AS n
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
      |          ELSE o_custkey END
      |   FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY probe""".stripMargin

  /** Correlated LATERAL join (SQL:1999 lateral derived table, Spark 4
    * `LATERAL` syntax): the inner aggregate re-evaluates per outer
    * row, preserving nations with zero customers as (0, NULL) — the
    * semantics a plain join+groupBy drops. Same SQL text runs on both
    * engines.
    *
    * Scale: Catalyst decorrelates the lateral subquery
    * (DecorrelateInnerQuery) into a left outer aggregate join — no
    * per-row re-execution; one shuffle on the correlation key. */
  def q40LateralJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q40Sql)
  }

  val q40Sql: String =
    """SELECT n.n_name, l.n_cust, l.total_bal
      |FROM nation n, LATERAL (
      |  SELECT COUNT(*) AS n_cust,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |      AS total_bal
      |  FROM customer c WHERE c.c_nationkey = n.n_nationkey) l
      |ORDER BY n_name""".stripMargin

  /** Bitmap-index distinct count — the EXACT complement of
    * [[q41SketchRollup]]: per (event_type, day) active-user counts
    * computed through dense 64-bit bitmap words instead of
    * `countDistinct`. Each row maps its user to (word = id div 64,
    * bit = 1 << id mod 64); `bit_or` collapses a word's users
    * map-side, then `bit_count` sums set bits per group. The shuffle
    * carries O(groups × words) longs — for 1e9 users that's ~16 MB of
    * bitmap per group REGARDLESS of row count, vs `countDistinct`'s
    * per-distinct-id rows; and unlike HLL it is exact. The id space
    * shards naturally on `word`, so a 100 TB run partitions by (key,
    * word) with no hot key. Oracle: DuckDB computes the same counts
    * with a plain COUNT(DISTINCT) — independent plan, same answer,
    * which is the point of the gate.
    *
    * Scale: two map-side-combinable aggregates, both codegen
    * (`bit_or`/`bit_count` are built-in); no row-level distinct
    * shuffle anywhere. */
  def q44BitmapDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("user_id") / 64).cast(LongType).as("word"),
        expr("shiftleft(1L, cast(user_id % 64 as int))").as("bit"))
      .groupBy(col("event_type"), col("day"), col("word"))
      .agg(bit_or(col("bit")).as("bm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(bit_count(col("bm")).cast(LongType)).as("n_active"))
      .orderBy(col("event_type"), col("day"))

  val q44Sql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |  COUNT(DISTINCT user_id) AS n_active
      |FROM events
      |GROUP BY event_type, CAST(ts AS DATE)
      |ORDER BY event_type, day""".stripMargin

  /** Skyline / Pareto-frontier query: the parts no other part beats
    * on BOTH axes (maximize `p_size`, minimize `p_retailprice`; one
    * axis strictly). The naive formulation is the O(n²) NOT-EXISTS
    * dominance self-join; the distributed plan here is the classic
    * 2-D skyline reduction:
    *
    *   1. corpus-wide reduce to per-size min price — O(distinct
    *      sizes) rows (p_size has ~50 values at any SF), map-side
    *      combinable;
    *   2. the frontier test is a running strict-min window over that
    *      METADATA-SIZED frame ordered by size desc — a size survives
    *      iff its min price undercuts every larger size's min (the
    *      unpartitioned window sees ~50 rows, the same bounded-frame
    *      discipline as the shard-packing phase-2 window);
    *   3. surviving (size, price) pairs broadcast-join back to `part`
    *      to emit the frontier rows — the fact table is scanned once
    *      and never shuffled.
    *
    * At 100 TB the only corpus-wide work is step 1's partial agg +
    * step 3's broadcast semi filter; nothing quadratic anywhere. The
    * oracle is the independent brute-force dominance plan. Price
    * values pass through both engines untouched (no arithmetic), so
    * double equality is exact. */
  def q45Skyline(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val bySize = part.groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("mn"))
    // ~50 rows: the unpartitioned frame is bounded by |distinct sizes|.
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = bySize
      .withColumn("prev_mn", min(col("mn")).over(w))
      .filter(col("prev_mn").isNull || col("mn") < col("prev_mn"))
      .select(col("p_size").as("f_size"), col("mn")) // fresh lineage vs part
    part.join(broadcast(frontier),
        col("p_size") === col("f_size") &&
        col("p_retailprice") === col("mn"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_size"), col("p_partkey"))
  }

  val q45Sql: String =
    """SELECT p.p_partkey, p.p_size, p.p_retailprice
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_size >= p.p_size
      |    AND q.p_retailprice <= p.p_retailprice
      |    AND (q.p_size > p.p_size
      |         OR q.p_retailprice < p.p_retailprice))
      |ORDER BY p.p_size, p.p_partkey""".stripMargin

  /** Native recursive CTE (`WITH RECURSIVE`, new in Spark 4.x —
    * `UnionLoopExec` iterates the recursive term until fixpoint):
    * walks a 10-level binary-heap hierarchy derived from `part`
    * (parent(k) = k div 2, keys 1..1023) from the root down and
    * reports per-depth node accounting. This is the genuinely
    * recursive relational surface — unbounded-depth traversal inside
    * ONE declarative statement, vs the unrolled fixed-iteration CTE
    * chains used where the depth is known ([[Graph.pageRankSql]]).
    *
    * Scale: each loop iteration is one broadcast-joinable level
    * frontier (the recursion carries only (key, depth) pairs); the
    * engine stops when a level is empty. DuckDB runs its own
    * `WITH RECURSIVE` of the same shape — two independent recursive
    * executors must converge to identical levels. */
  def q46Recursive(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("part")
    s.sql(
      """WITH RECURSIVE tree(k, depth) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_partkey = 1
        |  UNION ALL
        |  SELECT p.p_partkey, t.depth + 1
        |  FROM part p JOIN tree t ON p.p_partkey div 2 = t.k
        |  WHERE p.p_partkey BETWEEN 2 AND 1023)
        |SELECT depth, COUNT(*) AS n_nodes,
        |  MIN(k) AS min_key, MAX(k) AS max_key, SUM(k) AS sum_key
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q46Sql: String =
    """WITH RECURSIVE tree(k, depth) AS (
      |  SELECT p_partkey, 0 FROM part WHERE p_partkey = 1
      |  UNION ALL
      |  SELECT p.p_partkey, t.depth + 1
      |  FROM part p JOIN tree t ON p.p_partkey // 2 = t.k
      |  WHERE p.p_partkey BETWEEN 2 AND 1023)
      |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  MIN(k) AS min_key, MAX(k) AS max_key,
      |  CAST(SUM(k) AS BIGINT) AS sum_key
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  /** Boolean-aggregate family (`count_if` / `bool_and` / `bool_or`)
    * — the predicate-summary surface (DuckDB: same names). All three
    * are map-combinable single-pass aggregates; `any_value` is
    * deliberately absent (non-deterministic by contract, so it can
    * never sit behind a hash gate). */
  def q47BoolAggs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count_if(col("value") > 100).as("n_big"),
        bool_and(col("value") > 0).as("all_positive"),
        bool_or(col("value") > 400).as("any_huge"))
      .orderBy(col("event_type"))

  val q47Sql: String =
    """SELECT event_type,
      |  CAST(count_if(value > 100) AS BIGINT) AS n_big,
      |  bool_and(value > 0) AS all_positive,
      |  bool_or(value > 400) AS any_huge
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** `grouping_id()` provenance over a CUBE — the piece the plain
    * rollup/cube gates (q13/q14) don't pin: which aggregation level
    * produced each output row, as the bitmask consumers use to route
    * subtotal rows. The oracle rebuilds the same mask portably as
    * `2·GROUPING(a) + GROUPING(b)`. */
  def q48GroupingId(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("total"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  val q48Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
      |    AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  /** Deterministic MODE: the most frequent l_quantity per line
    * status, smallest value on count ties — built from groupBy +
    * row_number rather than the engines' `mode()` aggregates, whose
    * tie-breaking is implementation-defined (Spark picks an
    * arbitrary hash-order winner; pinning the ORDER BY makes the
    * result portable by construction). The ranking window partitions
    * on the group key over the (groups × distinct values) COUNT
    * frame, not the raw table — two map-combinable shuffles, both on
    * small keys. */
  def q49Mode(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_linestatus"))
      .orderBy(col("n").desc, col("l_quantity").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_linestatus"), col("l_quantity").as("mode_qty"),
        col("n"))
      .orderBy(col("l_linestatus"))
  }

  val q49Sql: String =
    """WITH counts AS (
      |  SELECT l_linestatus, l_quantity, COUNT(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT l_linestatus, l_quantity, n,
      |    row_number() OVER (PARTITION BY l_linestatus
      |      ORDER BY n DESC, l_quantity ASC) AS rk
      |  FROM counts)
      |SELECT l_linestatus, l_quantity AS mode_qty, n
      |FROM ranked WHERE rk = 1
      |ORDER BY l_linestatus""".stripMargin

  /** Exact DISCRETE percentiles (percentile_disc semantics: the
    * smallest data value whose cumulative count reaches ⌈p·n⌉ —
    * always an actual data point, never an interpolation) for
    * p ∈ {25, 50, 75, 95} of l_quantity per line status. q23 covers
    * the CONTINUOUS and approximate forms; the discrete form is what
    * SLA/latency reporting contracts specify. Computed from the
    * value HISTOGRAM (never a per-row global sort): per group, one
    * cumulative window over distinct values, then a conditional MIN
    * per target — all thresholds exact integers via ⌈⌉ = (n·p + 99)
    * div 100.
    *
    * Scale: one map-combinable (group, value) count; the windows run
    * on histogram-sized frames partitioned by group. */
  def q51PercentileDisc(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("l_linestatus"))
      .orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(col("l_linestatus"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(n))
    def pick(p: Int) = min(when(
      col("cum") >= expr(s"(n * $p + 99L) div 100"),
      col("l_quantity"))).as(s"p$p")
    cum.groupBy(col("l_linestatus"))
      .agg(max(col("n")).as("n"), pick(25), pick(50), pick(75),
        pick(95))
      .orderBy(col("l_linestatus"))
  }

  val q51Sql: String =
    """WITH hist AS (
      |  SELECT l_linestatus, l_quantity, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_linestatus, l_quantity,
      |    SUM(c) OVER (PARTITION BY l_linestatus ORDER BY l_quantity
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY l_linestatus) AS n
      |  FROM hist)
      |SELECT l_linestatus, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN cum >= (n * 25 + 99) // 100
      |    THEN l_quantity END) AS p25,
      |  MIN(CASE WHEN cum >= (n * 50 + 99) // 100
      |    THEN l_quantity END) AS p50,
      |  MIN(CASE WHEN cum >= (n * 75 + 99) // 100
      |    THEN l_quantity END) AS p75,
      |  MIN(CASE WHEN cum >= (n * 95 + 99) // 100
      |    THEN l_quantity END) AS p95
      |FROM cum GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** MapType higher-order-function surface — the map complement of
    * [[q42ArrayHof]]'s array-lambda gate: per-order line→quantity
    * MAPS built with `map_from_entries` over a deterministically
    * sorted entry list (collect_list alone is partition-order-
    * dependent — `array_sort` first, always), then driven through
    * the codegen map lambdas `transform_values` (double every
    * quantity) and `map_filter` (keep even line numbers), sized
    * BEFORE filtering, and exploded back to rows for a stable hash.
    * The oracle states the same CONTENT relationally — the gate
    * proves Spark's map surface reduces to the right relation, not
    * that DuckDB has the same lambda API.
    *
    * Scale: one groupBy(order) shuffle; maps are per-order structs
    * (bounded by lines-per-order, ~7), never corpus-wide state. */
  def q52MapHof(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      // the synthetic lineitem repeats line numbers within an order;
      // map keys must be unique, so quantities pre-sum per key
      .groupBy(col("l_orderkey"), col("l_linenumber").as("k"))
      .agg(sum(col("l_quantity").cast(LongType)).as("v"))
      .groupBy(col("l_orderkey"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("k"), col("v"))))).as("m"))
      .select(col("l_orderkey"),
        size(col("m")).cast(LongType).as("n_lines"),
        explode(map_filter(
          transform_values(col("m"), (_, v) => v * 2),
          (k, _) => k % 2 === 0)).as(Seq("k", "v2")))
      .orderBy(col("l_orderkey"), col("k"))
  }

  val q52Sql: String =
    """SELECT l_orderkey, n_lines, k, v2 FROM (
      |  SELECT l_orderkey,
      |    COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines,
      |    k, v * 2 AS v2
      |  FROM (
      |    SELECT l_orderkey, l_linenumber AS k,
      |      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      |    FROM lineitem WHERE l_orderkey < 100
      |    GROUP BY l_orderkey, l_linenumber))
      |WHERE k % 2 = 0
      |ORDER BY l_orderkey, k""".stripMargin

  /** `explode_outer` null-preservation semantics — the lateral-view
    * corner the plain `explode` gates skip: a customer with NO
    * orders keeps a row (its order-key column NULL) instead of
    * silently vanishing, which is exactly the difference between an
    * inner and an outer lateral join. The oracle states the same
    * relation as a LEFT JOIN, with `NULLS FIRST` pinned (Spark ASC
    * default vs DuckDB's NULLS LAST).
    *
    * Scale: the array build is one groupBy; the left join is
    * key-equi; nothing here changes shape at 100 TB. */
  def q53ExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
      .select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("ks"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), explode_outer(col("ks")).as("k"))
      .orderBy(col("c_custkey"), col("k"))
  }

  val q53Sql: String =
    """SELECT c.c_custkey, o.o_orderkey AS k
      |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE c.c_custkey < 200
      |ORDER BY c_custkey, k NULLS FIRST""".stripMargin

  /** Calendar-arithmetic surface — the date-function corners where
    * engines classically diverge, pinned: `last_day`, month addition
    * WITH end-of-month clamping (Jan 31 + 3mo = Apr 30 on both),
    * ISO week truncation (Monday on both), day-of-week (Spark is
    * 1=Sunday, DuckDB 0=Sunday — the oracle shifts explicitly rather
    * than trusting a shared default), and day differencing from a
    * fixed epoch. Pure projection — the gate is about SEMANTICS, not
    * shape. */
  def q54DateFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        last_day(col("o_orderdate")).as("eom"),
        add_months(col("o_orderdate"), 3).as("plus3"),
        date_trunc("week", col("o_orderdate")).cast(DateType).as("wk"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).cast(LongType).as("dd"))
      .orderBy(col("o_orderkey"))
  }

  val q54Sql: String =
    """SELECT o_orderkey,
      |  last_day(o_orderdate) AS eom,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(datediff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
      |FROM orders WHERE o_orderkey < 100
      |ORDER BY o_orderkey""".stripMargin

  /** String-function surface parity: the padding/truncation,
    * reversal, repetition, splitting, and 1-based search semantics
    * both engines share — pinned on real part names. lpad/rpad also
    * exercise the TRUNCATE-to-length branch (a 20-char pad of a
    * longer name cuts it — both engines do, but it's the kind of
    * semantics nobody checks until it corrupts a fixed-width
    * export). Pure projection. */
  def q55StringSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        lpad(col("p_name"), 20, ".").as("lp"),
        rpad(col("p_name"), 20, ".").as("rp"),
        reverse(col("p_name")).as("rev"),
        expr("repeat(left(p_name, 3), 2)").as("rep"),
        expr("replace(p_name, ' ', '_')").as("repl"),
        expr("split_part(p_name, ' ', 2)").as("sp2"),
        expr("CAST(instr(p_name, 'a') AS BIGINT)").as("pos_a"))
      .orderBy(col("p_partkey"))
  }

  val q55Sql: String =
    """SELECT p_partkey,
      |  lpad(p_name, 20, '.') AS lp,
      |  rpad(p_name, 20, '.') AS rp,
      |  reverse(p_name) AS rev,
      |  repeat(left(p_name, 3), 2) AS rep,
      |  replace(p_name, ' ', '_') AS repl,
      |  split_part(p_name, ' ', 2) AS sp2,
      |  CAST(instr(p_name, 'a') AS BIGINT) AS pos_a
      |FROM part WHERE p_partkey < 100
      |ORDER BY p_partkey""".stripMargin

  /** NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * semantics corner where a plain equi-join silently drops rows:
    * NULL = NULL is NULL under three-valued logic, so NULL-keyed
    * rows never match themselves; the null-safe operator makes NULL
    * a first-class join key. The gate self-joins a priority column
    * with planted NULLs (keys ≡0 mod 11) and accounts for exactly
    * where the extra matches come from: the NULL×NULL block.
    *
    * Planner note: Spark executes `<=>` joins as hash joins (the
    * operator is an equi-key for partitioning purposes — NULLs hash
    * together), NOT as a nested loop; that is the reason to prefer
    * it over the `(a = b OR (a IS NULL AND b IS NULL))` rewrite,
    * which falls off the equi-join path entirely. */
  def q56NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderkey") < 300)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 11 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("p"))
    val a = o.toDF("ka", "pa")
    val b = o.toDF("kb", "pb")
    a.join(b, col("pa") <=> col("pb"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("pa").isNull && col("pb").isNull, 1L)
          .otherwise(0L)).as("n_null_pairs"),
        sum(when(col("pa").isNotNull, 1L).otherwise(0L))
          .as("n_value_pairs"))
  }

  val q56Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |      ELSE o_orderpriority END AS p
      |  FROM orders WHERE o_orderkey < 300)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN a.p IS NULL AND b.p IS NULL THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_null_pairs,
      |  CAST(SUM(CASE WHEN a.p IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_value_pairs
      |FROM o a JOIN o b ON a.p IS NOT DISTINCT FROM b.p""".stripMargin

  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_null_safe_join" -> (q56NullSafeJoin _),
    "q55_string_surface" -> (q55StringSurface _),
    "q54_date_functions" -> (q54DateFunctions _),
    "q53_explode_outer" -> (q53ExplodeOuter _),
    "q52_map_hof" -> (q52MapHof _),
    "q51_percentile_disc" -> (q51PercentileDisc _),
    "q49_mode"           -> (q49Mode _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project"  -> (q2FilterProject _),
    "q3_top_revenue"     -> (q3TopRevenue _),
    "q4_semi_join"       -> (q4SemiJoin _),
    "q5_anti_join"       -> (q5AntiJoin _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_outer_join"      -> (q7OuterJoin _),
    "q8_window_rank"     -> (q8WindowRank _),
    "q9_window_running"  -> (q9WindowRunning _),
    "q10_top_spenders"   -> (q10TopSpenders _),
    "q11_distinct_agg"   -> (q11DistinctAgg _),
    "q12_set_ops"        -> (q12SetOps _),
    "q13_rollup"         -> (q13Rollup _),
    "q14_cube"           -> (q14Cube _),
    "q15_case_bucket"    -> (q15CaseBucket _),
    "q16_string_funcs"   -> (q16StringFuncs _),
    "q17_date_buckets"   -> (q17DateBuckets _),
    "q18_avg_subquery"   -> (q18AvgSubquery _),
    "q19_having"         -> (q19Having _),
    "q20_cross_join"     -> (q20CrossJoin _),
    "q21_null_handling"  -> (q21NullHandling _),
    "q22_scalar_math"    -> (q22ScalarMath _),
    "q23_percentiles"    -> (q23Percentiles _),
    "q23_percentiles_approx" -> (q23PercentilesApprox _),
    "q24_pivot"          -> (q24Pivot _),
    "q25_cohort"         -> (q25CohortRetention _),
    "q26_window_funcs"   -> (q26WindowFuncs _),
    "q27_json_extract"   -> (q27JsonExtract _),
    "q28_set_ops_all"    -> (q28SetOpsAll _),
    "q29_grouping_sets"  -> (q29GroupingSets _),
    "q30_string_agg"     -> (q30StringAgg _),
    "q31_exists_subquery" -> (q31ExistsSubquery _),
    "q32_stats_moments"  -> (q32StatsMoments _),
    "q33_range_frame"    -> (q33RangeFrame _),
    "q34_range_join"     -> (q34RangeJoinBinned _),
    "q35_unpivot"        -> (q35Unpivot _),
    "q36_variant"        -> (q36Variant _),
    "q37_approx_distinct" -> (q37ApproxDistinct _),
    "q38_rolling_distinct" -> (q38RollingDistinct _),
    "q39_null_anti_join" -> (q39NullAntiJoin _),
    "q40_lateral_join"   -> (q40LateralJoin _),
    "q41_sketch_rollup"  -> (q41SketchRollup _),
    "q42_array_hof"      -> (q42ArrayHof _),
    "q43_window_family"  -> (q43WindowFamily _),
    "q44_bitmap_distinct" -> (q44BitmapDistinct _),
    "q45_skyline"        -> (q45Skyline _),
    "q46_recursive_cte"  -> (q46Recursive _),
    "q47_bool_aggs"      -> (q47BoolAggs _),
    "q48_grouping_id"    -> (q48GroupingId _))

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project"  -> q2Sql,
    "q3_top_revenue"     -> q3Sql,
    "q4_semi_join"       -> q4Sql,
    "q5_anti_join"       -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_outer_join"      -> q7Sql,
    "q8_window_rank"     -> q8Sql,
    "q9_window_running"  -> q9Sql,
    "q10_top_spenders"   -> q10Sql,
    "q11_distinct_agg"   -> q11Sql,
    "q12_set_ops"        -> q12Sql,
    "q13_rollup"         -> q13Sql,
    "q14_cube"           -> q14Sql,
    "q15_case_bucket"    -> q15Sql,
    "q16_string_funcs"   -> q16Sql,
    "q17_date_buckets"   -> q17Sql,
    "q18_avg_subquery"   -> q18Sql,
    "q19_having"         -> q19Sql,
    "q20_cross_join"     -> q20Sql,
    "q21_null_handling"  -> q21Sql,
    "q22_scalar_math"    -> q22Sql,
    "q23_percentiles"    -> q23Sql,
    "q23_percentiles_approx" -> q23ApproxSql,
    "q24_pivot"          -> q24Sql,
    "q25_cohort"         -> q25Sql,
    "q26_window_funcs"   -> q26Sql,
    "q27_json_extract"   -> q27Sql,
    "q28_set_ops_all"    -> q28Sql,
    "q29_grouping_sets"  -> q29Sql,
    "q30_string_agg"     -> q30Sql,
    "q31_exists_subquery" -> q31Sql,
    "q32_stats_moments"  -> q32Sql,
    "q33_range_frame"    -> q33Sql,
    "q34_range_join"     -> q34Sql,
    "q35_unpivot"        -> q35Sql,
    "q36_variant"        -> q36Sql,
    "q37_approx_distinct" -> q37Sql,
    "q38_rolling_distinct" -> q38Sql,
    "q39_null_anti_join" -> q39Sql,
    "q40_lateral_join"   -> q40Sql,
    "q41_sketch_rollup"  -> q41Sql,
    "q42_array_hof"      -> q42Sql,
    "q43_window_family"  -> q43Sql,
    "q44_bitmap_distinct" -> q44Sql,
    "q45_skyline"        -> q45Sql,
    "q46_recursive_cte"  -> q46Sql,
    "q47_bool_aggs"      -> q47Sql,
    "q48_grouping_id"    -> q48Sql,
    "q49_mode"           -> q49Sql,
    "q51_percentile_disc" -> q51Sql,
    "q52_map_hof" -> q52Sql,
    "q53_explode_outer" -> q53Sql,
    "q54_date_functions" -> q54Sql,
    "q55_string_surface" -> q55Sql,
    "q56_null_safe_join" -> q56Sql)
}
