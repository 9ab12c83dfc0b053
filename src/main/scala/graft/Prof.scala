package graft

import org.apache.spark.sql.functions.col

/** Dev-only micro-profiler for hotspot queries. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    val d01 = "/root/testdata/sf0.01"
    val d1 = "/root/testdata/sf0.1"
    time("corpus_count_sf0.1") {
      ops.DocCorpus.withDuplicates(spark, d1).count()
    }
    time("fingerprint_only_sf0.1") {
      ops.DocCorpus.withDuplicates(spark, d1)
        .select(functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup_exact_sf0.01") {
      ops.Dedup.exact(spark, d01).write.format("noop").mode("overwrite").save()
    }
    time("dedup_exact_sf0.1") {
      ops.Dedup.exact(spark, d1).write.format("noop").mode("overwrite").save()
    }
    time("simhash_df_sf0.1") {
      functions.TextFunctions.simhashDf(
        ops.DocCorpus.withDuplicates(spark, d1), "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup_simhash_sf0.1") {
      ops.Dedup.simhash(spark, d1).write.format("noop").mode("overwrite").save()
    }
    time("sim_near_dup_sf0.1") {
      ops.Similarity.nearDupPairs(spark, d1)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
