package graft

import org.apache.spark.sql.functions._

import graft.ops.Maintenance

/** Upsert (MERGE) semantics and compaction behavior. */
class MaintenanceSpec extends SparkSpec {

  test("upsert replaces matched keys, keeps unmatched, inserts new") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0))
      .toDF("k", "tag", "v")
    val got = Maintenance.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert on a composite key") {
    import spark.implicits._
    val base = Seq((1L, 1, "x"), (1L, 2, "y")).toDF("k1", "k2", "v")
    val updates = Seq((1L, 2, "Y")).toDF("k1", "k2", "v")
    val got = Maintenance.upsert(base, updates, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 1, "x"), (1L, 2, "Y")))
  }

  test("CDC stream applies change batches to a parquet table") {
    import spark.implicits._
    val baseDir = tmpDir("cdc_base")
    val srcDir = tmpDir("cdc_changes")
    val ck = tmpDir("cdc_ckpt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(baseDir)

    // Batch 1: update k=2, insert k=4.
    Seq((2L, "B"), (4L, "d")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q = Maintenance.applyCdcStream(
      spark.readStream.schema(schema).parquet(srcDir),
      baseDir, Seq("k"), ck)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(baseDir).orderBy("k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))

      // Batch 2: update k=4, insert k=5.
      Seq((4L, "D"), (5L, "e")).toDF("k", "v")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(spark.read.parquet(baseDir).orderBy("k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D"), (5L, "e")))
    } finally q.stop()
  }

  test("compact collapses a small-file storm, preserving content") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"))
    val src = tmpDir("compact_src")
    li.repartition(32).write.mode("overwrite").parquet(src)
    val nSrc = new java.io.File(src).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nSrc == 32)

    val dst = tmpDir("compact_dst")
    Maintenance.compact(spark, src, dst, targetBytes = 1L * 1024 * 1024)
    val nDst = new java.io.File(dst).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nDst < nSrc, s"expected fewer files, got $nDst")

    // Content identical (bag equality).
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("TableSwap keeps a full copy on disk at every instant") {
    import spark.implicits._
    import graft.ops.TableSwap
    val target = tmpDir("swap_target") + "/t"
    val staging = target + ".staging"
    Seq((1L, "old")).toDF("k", "v").write.parquet(target)
    Seq((2L, "new")).toDF("k", "v").write.parquet(staging)

    // Simulate the crash window the old delete-then-rename had: after
    // step (1) the committed table must still exist (at .old) even
    // though the target path is briefly vacant.
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(target),
      new org.apache.hadoop.fs.Path(target + ".old")) // = crash after (1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target)))
    assert(spark.read.parquet(target + ".old").count() == 1) // data safe

    // Recovery restores the committed table.
    assert(TableSwap.recover(spark, target))
    assert(spark.read.parquet(target)
      .as[(Long, String)].collect().toSeq == Seq((1L, "old")))

    // And the full swap lands the staging data with no loss window.
    TableSwap.swapIn(spark, target, staging)
    assert(spark.read.parquet(target)
      .as[(Long, String)].collect().toSeq == Seq((2L, "new")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)))
  }

  test("swap retention ring + rollback restores the pre-purge table") {
    import spark.implicits._
    import graft.ops.TableSwap
    val target = tmpDir("swap_ring") + "/t"
    def stage(v: String): String = {
      val staging = target + ".staging"
      Seq((1L, v)).toDF("k", "v").write.mode("overwrite").parquet(staging)
      staging
    }
    def current(): String =
      spark.read.parquet(target).as[(Long, String)].head()._2
    Seq((1L, "v1")).toDF("k", "v").write.parquet(target)
    TableSwap.swapIn(spark, target, stage("v2"), retain = 2)
    TableSwap.swapIn(spark, target, stage("v3"), retain = 2)
    TableSwap.swapIn(spark, target, stage("v4"), retain = 2)
    assert(current() == "v4")
    // ring holds the last 2 generations: v3 (bak0), v2 (bak1); v1 pruned
    assert(spark.read.parquet(target + ".bak0")
      .as[(Long, String)].head()._2 == "v3")
    assert(spark.read.parquet(target + ".bak1")
      .as[(Long, String)].head()._2 == "v2")
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target + ".bak2")))
    // rollbacks walk back v4 → v3 → v2, then report nothing to restore
    assert(TableSwap.rollback(spark, target) && current() == "v3")
    assert(TableSwap.rollback(spark, target) && current() == "v2")
    assert(!TableSwap.rollback(spark, target))
    assert(current() == "v2")
  }

  test("a retained purge is reversible: rollback restores deleted rows") {
    import graft.ops.{Purge, TableSwap}
    val root = tmpDir("purge_rollback")
    val df = spark.range(100).toDF("id")
      .withColumn("status",
        when(col("id") % 2 === 0, "EXPIRED").otherwise("ACTIVE"))
    graft.sources.ParquetSink.write(df, s"$root/t")
    new Purge.Engine(spark, Purge.DirResolver(root), retainBackups = 1)
      .run(Seq(Purge.PurgeConfig("tester", "t", "CRITERIA",
        "status = 'EXPIRED'", Long.MaxValue)))
    assert(spark.read.parquet(s"$root/t").count() == 50)
    // the bad-purge escape hatch: restore the pre-purge generation
    assert(TableSwap.rollback(spark, s"$root/t"))
    val restored = spark.read.parquet(s"$root/t")
    assert(restored.count() == 100)
    assert(restored.filter(col("status") === "EXPIRED").count() == 50)
  }

  test("TableSwap on a fresh path (no existing target)") {
    import spark.implicits._
    import graft.ops.TableSwap
    val target = tmpDir("swap_fresh") + "/t"
    val staging = target + ".staging"
    Seq((7L, "x")).toDF("k", "v").write.parquet(staging)
    TableSwap.swapIn(spark, target, staging)
    assert(spark.read.parquet(target)
      .as[(Long, String)].collect().toSeq == Seq((7L, "x")))
  }

  test("snapshotDiff classifies added/deleted/changed; unchanged silent") {
    import spark.implicits._
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "x")
    val neu = Seq((2L, "B", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("k", "v", "x")
    val out = Maintenance.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "deleted", 2L -> "changed", 4L -> "added"))
    // the classifying join's inputs are (key, hash) projections — no
    // payload column survives to the exchange
    val plan = Maintenance.snapshotDiff(old, neu, Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("v#") ||
      plan.indexOf("xxhash64") < plan.indexOf("Join"), plan)
  }
}
