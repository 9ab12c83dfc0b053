package graft

import org.apache.spark.sql.functions._

/** Dev-only: dbscan-LSH operating-point study (round-8 verdict
  * task 2's "bits/tables study") — for each (bits, nTables) point
  * with the same per-pair miss budget, measure collision volume and
  * wall time of the pair stage at sf0.1, plus end-to-end dbscanLsh.
  * T(b) chosen so (1 − q^b)^T ≈ 2e-4 at q = P(collide/bit at
  * cos = 0.35) = 1 − arccos(0.35)/π ≈ 0.614. */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val points = Seq((3, 32), (4, 55), (5, 93), (6, 155))
    points.foreach { case (bits, tables) =>
      // warm
      graft.ops.Similarity.dbscanLshPairs(spark, dir, 0.35, tables, bits)
        .count()
      val t0 = System.nanoTime()
      val pairs = graft.ops.Similarity
        .dbscanLshPairs(spark, dir, 0.35, tables, bits).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.ops.Similarity.dbscanLsh(spark, dir, 0.35, 3, tables, bits)
        .write.format("noop").mode("overwrite").save()
      val dtFull = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"[prof4] bits=$bits%d tables=$tables%3d " +
        f"eps_pairs=$pairs%6d pair_stage=$dt%6.2fs full=$dtFull%6.2fs")
    }
    spark.stop()
  }
}
