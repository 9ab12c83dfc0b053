package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the round-9 keyed-store streaming dedup gates:
  * wraps [[graft.ops.Dedup.streamMinhashLsh]]'s phases with wall
  * timers by replicating its body inline. Not a gate. */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof-stream")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.functions.TextFunctions
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val s = spark
    val srcDir = "/tmp/graft_prof/mh/src"
    val pairsDir = "/tmp/graft_prof/mh/pairs"
    val ck = graft.streaming.EventStreams.gateCheckpoint("prof_mh")
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def rm(p: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(p), true): Unit
    val corpus = graft.ops.DocCorpus.withDuplicates(s, dir)
      .select(col("doc_id"), col("text"))
    t("setup write b0") {
      Seq(srcDir, pairsDir, ck).foreach(rm)
      corpus.filter(col("doc_id") % 3 === 0).coalesce(2).write
        .mode("overwrite").parquet(srcDir)
    }
    t("batch-mode projection b0") {
      s.read.parquet(srcDir)
        .select(col("doc_id"),
          TextFunctions.shingleHashes(lower(col("text")), 3).as("hashes"))
        .filter(size(col("hashes")) > 0)
        .select(col("doc_id"), col("hashes"),
          posexplode(TextFunctions.minhashBands(
            TextFunctions.minhashSignatureOfHashes(col("hashes")),
            8, 4)))
        .write.format("noop").mode("overwrite").save()
    }
    t("batch-mode projection b0 x2") {
      s.read.parquet(srcDir)
        .select(col("doc_id"),
          TextFunctions.shingleHashes(lower(col("text")), 3).as("hashes"))
        .filter(size(col("hashes")) > 0)
        .select(col("doc_id"), col("hashes"),
          posexplode(TextFunctions.minhashBands(
            TextFunctions.minhashSignatureOfHashes(col("hashes")),
            8, 4)))
        .write.format("noop").mode("overwrite").save()
    }
    import s.implicits._
    graft.streaming.EventStreams.withRocksDb(s, statePartitions = 4) {
      val pairs = s.readStream.schema(corpus.schema).parquet(srcDir)
        .select(col("doc_id"),
          TextFunctions.shingleHashes(lower(col("text")), 3).as("hashes"))
        .filter(size(col("hashes")) > 0)
        .select(col("doc_id"), col("hashes"),
          posexplode(TextFunctions.minhashBands(
            TextFunctions.minhashSignatureOfHashes(col("hashes")),
            8, 4)))
        .select(col("col.band").as("band"), col("col.bucket").as("bucket"),
          col("doc_id"), col("hashes"))
        .as[(Int, Long, Long, Array[Long])]
        .groupByKey(r => (r._1, r._2))
        .transformWithState(new graft.streaming.LshBucketProcessor(0.6),
          TimeMode.None(), OutputMode.Append())
      val q = t("query start") {
        pairs.toDF.writeStream
          .format("parquet")
          .option("path", pairsDir)
          .option("checkpointLocation", ck)
          .outputMode("append")
          .start()
      }
      try {
        t("batch 0")(q.processAllAvailable())
        t("write b1") {
          corpus.filter(col("doc_id") % 3 === 1).coalesce(2).write
            .mode("append").parquet(srcDir)
        }
        t("batch 1")(q.processAllAvailable())
        t("write b2") {
          corpus.filter(col("doc_id") % 3 === 2).coalesce(2).write
            .mode("append").parquet(srcDir)
        }
        t("batch 2")(q.processAllAvailable())
        q.recentProgress.foreach { p =>
          println(s"[prof] progress batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
          p.stateOperators.foreach(so =>
            println(s"[prof]   state: commit=${so.commitTimeMs}ms " +
              s"rowsUpdated=${so.numRowsUpdated} total=${so.numRowsTotal} " +
              s"mem=${so.memoryUsedBytes}"))
        }
      } finally {
        q.stop()
        graft.streaming.EventStreams.dropCheckpoint(ck)
      }
    }
    val out = t("final read+distinct") {
      s.read.parquet(pairsDir)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
        .collect()
    }
    println(s"[prof] pairs = ${out.length}")
    spark.stop()
  }
}
