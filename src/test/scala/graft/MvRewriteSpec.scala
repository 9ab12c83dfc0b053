package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.Maintenance

/** Plan contract for the materialized-view rewrite: the gate query's
  * optimized plan must read the summary parquet and must NOT read the
  * fact table; values must equal the direct computation. */
class MvRewriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Root paths of every file-source relation in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString).mkString(",")
        case _ => ""
      }
    }

  test("aggregate over the raw scan is answered from the summary") {
    val df = Maintenance.mvRewriteAgg(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("mv_lineitem_rf_ls")),
      s"summary relation missing; scans: $paths")
    assert(!paths.exists(_.contains("lineitem.parquet")),
      s"fact-table scan survived the rewrite; scans: $paths")
    // and the rewritten answer equals the direct one
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))
        .cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_returnflag")).collect()
    val viaMv = df.collect()
    assert(viaMv.length == direct.length)
    viaMv.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getDouble(1) == b.getDouble(1), s"sum_qty ${a.getString(0)}")
      assert(a.getLong(2) == b.getLong(2), s"n ${a.getString(0)}")
      assert(a.getDouble(3) == b.getDouble(3))
      assert(a.getDouble(4) == b.getDouble(4))
    }
  }

  test("a non-derivable aggregate leaves the plan untouched") {
    Maintenance.mvRewriteAgg(spark, sf) // ensure registered + installed
    val df = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_tax")).as("sum_tax")) // l_tax not a registered measure
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("lineitem.parquet")),
      s"rewrite fired for an unregistered measure; scans: $paths")
    assert(!paths.exists(_.contains("mv_lineitem_rf_ls")))
  }

  test("a non-dimension filter blocks the rewrite") {
    Maintenance.mvRewriteAgg(spark, sf)
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10) // not a dimension
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("lineitem.parquet")),
      s"rewrite fired through a fact-column filter; scans: $paths")
    assert(!paths.exists(_.contains("mv_lineitem_rf_ls")))
  }
}
