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

  test("count_min_sketch estimates bound exact frequencies from above") {
    import org.apache.spark.util.sketch.CountMinSketch
    val e = Tables.events(spark, dir)
    val bytes = e.agg(
      expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = e.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      // CMS never underestimates; eps=0.1% of stream length bounds
      // the overestimate with 99% confidence
      assert(est >= n && est <= n + (0.002 * total).toLong + 1,
        s"$k exact=$n est=$est")
    }
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
