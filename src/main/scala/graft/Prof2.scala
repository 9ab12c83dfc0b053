package graft

/** Dev-only: variance probe — one query N times in one JVM. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = "/root/testdata/sf0.1"
    val q = args.lift(0).getOrElse("dedup_minhash_lsh")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d1)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof2] $q run$i ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    spark.stop()
  }
}
