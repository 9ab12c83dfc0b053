package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes)
  }

  test("bucketed join runs with no shuffle exchange and no sort") {
    Bucketing.writeBucketed(spark, dir)
    val joined = Bucketing.bucketedJoin(spark)
    joined.collect() // force execution so AQE finalizes the plan
    val nodes = collectNodes(joined.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "bucketed join must not shuffle")
    assert(!nodes.exists(_.isInstanceOf[SortExec]),
      "SORTED BY buckets must not re-sort at query time")
  }

  test("bucketed join equals plain join") {
    Bucketing.writeBucketed(spark, dir)
    val bucketed = Bucketing.bucketedJoin(spark)
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    val plain = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_mktsegment")
    assert(bucketed.count() == plain.count())
    assert(bucketed.exceptAll(plain).isEmpty &&
      plain.exceptAll(bucketed).isEmpty)
  }
}
