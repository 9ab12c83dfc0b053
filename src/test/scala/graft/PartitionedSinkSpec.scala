package graft

import org.apache.spark.sql.functions._

import graft.sources.ParquetSink

class PartitionedSinkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned write prunes directories on a partition filter") {
    val out = tmpDir("part_events")
    val events = Tables.events(spark, dir)
    ParquetSink.writePartitioned(events, out, Seq("event_type"))
    // hive layout on disk: one dir per event_type
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(dirs.length == 5, dirs.mkString(","))

    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    // partition filter reaches the scan; data filters stay empty
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan.take(500))
    assert(q.count() ==
      events.filter(col("event_type") === "click").count())
    // values round-trip (partition col re-materialized from the path)
    val back = q.select("event_id", "event_type")
    val orig = events.filter(col("event_type") === "click")
      .select("event_id", "event_type")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
