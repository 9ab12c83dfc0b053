package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Skew-mitigation operators: explicit key salting for joins and
  * aggregations whose key distribution has hot keys.
  *
  * At 100 TB a single hot key (one user generating 1% of all events)
  * turns a shuffle join or groupBy into one straggler task. AQE's
  * skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) splits oversized sort-merge partitions at runtime and is
  * the first line of defense; explicit salting is the declarative
  * fallback for the cases AQE can't touch — shuffled hash joins of a
  * non-splittable hot key, and hot-key groupBys (AQE never splits an
  * aggregation key).
  *
  * Both operators are pure row-level rewrites: results are EXACTLY
  * equal to the unsalted plan (the DuckDB oracle checks the salted
  * path against the plain SQL join/aggregate).
  */
object Skew {

  /** Join `fact` (large, skewed on `key`) to `dim` (small-ish but too
    * big or too dynamic to broadcast) with an `nSalts`-way salt:
    * the fact side salts each row deterministically by hashing
    * `saltSource` (any column that distributes a hot key's rows, e.g.
    * a unique id), the dim side is replicated `nSalts`× — so one hot
    * key's rows spread over `nSalts` shuffle partitions instead of
    * one straggler.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, nSalts: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(nSalts.toLong)).cast(IntegerType))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over `nSalts` reducers — then
    * merge per key. `aggs` maps output column → (partial, merge)
    * expression builders over the value column.
    *
    * NOTE Spark's own hash aggregation already does map-side partial
    * aggregation, which handles most groupBy skew; explicit salting
    * adds a second reduce tier for the case where even the PARTIAL
    * rows of one key (one per mapper) overwhelm a single reducer —
    * i.e. extreme cardinality-1-ish keys on very wide clusters.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltSource: String, nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(nSalts.toLong)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("total"), sum(col("_n")).as("n"))
  }

  // ---------------------------------------------------------------- //

  /** Gate query: events joined to customer through the salted join,
    * aggregated per market segment. Decimal-exact sum (determinism
    * policy: float sums via DECIMAL on both sides). */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(events, cust, "user_id", "event_id")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  val saltedJoinAggSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Gate query: per-user value totals through the two-phase salted
    * aggregation. */
  def saltedAggTotals(s: SparkSession, dir: String): DataFrame =
    saltedSum(
      Tables.events(s, dir)
        .withColumn("value", col("value").cast(DecimalType(18, 4))),
      "user_id", "value", "event_id")
      .select(col("user_id"), col("total").cast(DoubleType).as("total"),
        col("n"))
      .orderBy(col("user_id"))

  val saltedAggTotalsSql: String =
    """SELECT user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Skew doctor: the diagnostic you run BEFORE choosing a salt
    * factor. Per-key row counts (one map-combinable groupBy), then
    * the top-`topN` hottest keys each annotated with its corpus
    * share (ppm) and the salt factor that would level it to the mean
    * key — `ceil(c·n_keys/total)`, i.e. how many mean-sized keys this
    * key equals. All integer arithmetic (`div`), the O(keys) count
    * frame aggregates to ONE broadcast stats row, and only `topN`
    * rows survive to the output — safe at any key cardinality.
    */
  def skewDiagnose(s: SparkSession, dir: String, topN: Int = 5)
      : DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("c")).as("total"))
    counts.crossJoin(broadcast(stats))
      .withColumn("share_ppm", expr("c * 1000000 div total"))
      .withColumn("salt_factor",
        expr("(c * n_keys + total - 1) div total"))
      .orderBy(col("c").desc, col("user_id"))
      .limit(topN)
      .select(col("user_id"), col("c").as("key_rows"), col("n_keys"),
        col("total").as("total_rows"), col("share_ppm"),
        col("salt_factor"))
  }

  val skewDiagnoseSql: String =
    """WITH counts AS (
      |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
      |stats AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS total
      |  FROM counts)
      |SELECT user_id, c AS key_rows, n_keys, total AS total_rows,
      |  c * 1000000 // total AS share_ppm,
      |  (c * n_keys + total - 1) // total AS salt_factor
      |FROM counts, stats
      |ORDER BY c DESC, user_id
      |LIMIT 5""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_diagnose"    -> ((s: SparkSession, d: String) => skewDiagnose(s, d)),
    "skew_salted_join" -> (saltedJoinAgg _),
    "skew_salted_agg"  -> (saltedAggTotals _))

  def oracle: Map[String, String] = Map(
    "skew_diagnose"    -> skewDiagnoseSql,
    "skew_salted_join" -> saltedJoinAggSql,
    "skew_salted_agg"  -> saltedAggTotalsSql)
}
