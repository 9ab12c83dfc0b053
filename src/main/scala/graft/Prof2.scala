package graft

/** Dev-only: drive SparkEntry.entry the way the harness smoke does —
  * a bare default session, no graft-side conf. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0)
    spark.stop()
  }
}
