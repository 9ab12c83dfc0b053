package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is materialized through the `noop` sink — unlike
  * `count()`, which lets Catalyst prune every column and skip the
  * projection work, noop evaluates the full output rows while writing
  * nothing, so timings reflect real operator cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: run EVERY query once on the smallest corpus. Janino
    // compilation of each query's generated code + C2 JIT of the hot
    // methods cost ~100s spread over whichever queries run first in a
    // cold JVM (measured: the same query swings 1s↔57s run-to-run).
    // The generated code is identical across scale factors, so this
    // moves all of it outside the measured window; measurements below
    // are steady-state operator cost.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Best-of-2 in two SEPARATED passes: the host shows multi-second
    // noisy-neighbor stalls (the same query swings 2.7s↔81s
    // run-to-run with identical plans and <15% CPU), and a stall
    // burst can span consecutive runs — so sample each query once per
    // pass and take the min, putting minutes between the two samples.
    def sample(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try materialize(name, fn)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val passes = (1 to nPasses).map(_ => sample())
    val results = passes.head.keys.toSeq.sorted.map { name =>
      val sec = passes.map(_(name)).min
      System.err.println(f"[bench] $name%-24s $sec%8.2fs")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
