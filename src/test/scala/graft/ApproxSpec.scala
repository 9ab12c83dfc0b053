package graft

import org.apache.spark.sql.functions._

/** The sketch-based scale paths documented next to their exact
  * counterparts (q11 exact distinct, q23 exact percentiles): HLL++
  * `approx_count_distinct` and KLL-ish `percentile_approx` are
  * mergeable, single-pass, bounded-memory — the 100 TB formulation.
  * These tests pin their error against the exact answers so the
  * documented substitution is demonstrated, not asserted. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% rsd of exact") {
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx"))
      .collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact percentile") {
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.9)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.9, 1000)").as("approx"))
      .collect()(0)
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx=$approx exact=$exact")
  }
}
