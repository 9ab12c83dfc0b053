package graft

import org.apache.spark.sql.functions.col

/** Dev-only: plan + partition inspection for the quadratic queries. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = "/root/testdata/sf0.1"
    val nd = ops.Similarity.nearDupPairs(spark, d1)
    nd.explain("formatted")
    val base = ops.Similarity.withNearDuplicates(spark, d1)
    println("corpus partitions: " +
      base.rdd.getNumPartitions)
    println("corpus repart partitions: " +
      base.repartition(16).rdd.getNumPartitions)
    spark.stop()
  }
}
