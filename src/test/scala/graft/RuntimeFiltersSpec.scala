package graft

import graft.ops.RuntimeFilters

/** Plan contracts for runtime filtering: DPP must install a dynamic
  * pruning subquery on the partition column, and the bloom path must
  * push a bloom_filter_might_contain predicate into the application
  * side — both asserted on the physical plan, with executed-partition
  * accounting for DPP. */
class RuntimeFiltersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("DPP: partition filter is a runtime subquery, scan reads only odd years") {
    val df = RuntimeFilters.dppGate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in plan:\n${plan.take(1500)}")
    // Execution proof: every surviving group is an odd year.
    val years = df.collect().map(_.getLong(0))
    assert(years.nonEmpty && years.forall(_ % 2 == 1),
      s"even years leaked through: ${years.mkString(",")}")
  }

  test("bloom join: might_contain pushed into the big side's pre-shuffle filter") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    // a broadcastable creation side suppresses injection entirely
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RuntimeFilters.bloomQuery(spark, sf)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected:\n${plan.take(1500)}")
      val r = df.collect().head
      assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
