package graft

import org.apache.spark.sql.functions._

import graft.ops.Purge
import graft.sources.ParquetSink

class PurgeSpec extends SparkSpec {
  import spark.implicits._

  /** A small purge-able table: 100 rows, half ACTIVE half EXPIRED. */
  private def mkTable(root: String, name: String = "t"): String = {
    val df = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) "EXPIRED" else "ACTIVE"))
      .toDF("id", "status")
    ParquetSink.write(df, s"$root/$name")
    s"$root/$name"
  }

  private def engine(root: String, dryRun: Boolean = false) =
    new Purge.Engine(spark, Purge.DirResolver(root), dryRun)

  private def cfg(criteria: String, max: Long = Long.MaxValue,
      table: String = "t", action: String = "CRITERIA") =
    Purge.PurgeConfig("tester", table, action, criteria, max)

  test("criteria delete removes matching rows (Q4)") {
    val root = tmpDir("purge")
    val path = mkTable(root)
    engine(root).run(Seq(cfg("status = 'EXPIRED'")))
    val left = spark.read.parquet(path)
    assert(left.count() == 50)
    assert(left.filter($"status" === "EXPIRED").count() == 0)
  }

  test("guard count aborts when matches exceed maxRecordCount (A1)") {
    val root = tmpDir("purge")
    val path = mkTable(root)
    val log = engine(root).run(Seq(cfg("status = 'EXPIRED'", max = 10)))
    assert(spark.read.parquet(path).count() == 100)
    assert(log.exists(_.logMessage.startsWith("ABORT")))
  }

  test("dry run computes counts but writes nothing (Q8)") {
    val root = tmpDir("purge")
    val path = mkTable(root)
    val log = engine(root, dryRun = true).run(Seq(cfg("status = 'EXPIRED'")))
    assert(spark.read.parquet(path).count() == 100)
    assert(log.exists(_.logMessage.contains("DRY RUN")))
  }

  test("TRUNCATE fast path empties while keeping schema (Q3)") {
    val root = tmpDir("purge")
    val path = mkTable(root)
    engine(root).run(Seq(cfg("TRUNCATE TABLE t", action = "SQL")))
    val left = spark.read.parquet(path)
    assert(left.count() == 0)
    assert(left.columns.toSeq == Seq("id", "status"))
  }

  test("missing table → skip with audit (Q2)") {
    val root = tmpDir("purge")
    mkTable(root)
    val log = engine(root).run(Seq(cfg("1=1", table = "ghost")))
    assert(log.exists(e =>
      e.tableName == "ghost" && e.logMessage.contains("not found")))
  }

  test("comma table list selects, 'all' takes everything (Q1)") {
    val root = tmpDir("purge")
    val p1 = mkTable(root, "t1")
    val p2 = mkTable(root, "t2")
    val configs = Seq(
      cfg("status = 'EXPIRED'", table = "t1"),
      cfg("status = 'EXPIRED'", table = "t2"))
    engine(root).run(configs, tables = "t1")
    assert(spark.read.parquet(p1).count() == 50)
    assert(spark.read.parquet(p2).count() == 100)
    engine(root).run(configs, tables = "all")
    assert(spark.read.parquet(p2).count() == 50)
  }

  /** Partitioned copy: 100 rows across status=ACTIVE/EXPIRED dirs. */
  private def mkPartitioned(root: String, name: String = "t"): String = {
    val df = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) "EXPIRED" else "ACTIVE"))
      .toDF("id", "status")
    ParquetSink.writePartitioned(df, s"$root/$name", Seq("status"))
    s"$root/$name"
  }

  test("criteria on a partition column drops directories, not rewrites") {
    val root = tmpDir("purge")
    val path = mkPartitioned(root)
    val survivor = java.nio.file.Paths.get(path, "status=ACTIVE")
    import scala.jdk.CollectionConverters._
    def files() = java.nio.file.Files.list(survivor).iterator().asScala
      .map(p => (p.getFileName.toString,
        java.nio.file.Files.getLastModifiedTime(p).toMillis)).toSet
    val before = files()
    val log = engine(root).run(Seq(cfg("status = 'EXPIRED'")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "status=EXPIRED")))
    assert(files() == before, "surviving partition was rewritten")
    assert(log.exists(_.logMessage.contains("partition-pruned")))
    val left = spark.read.parquet(path)
    assert(left.count() == 50)
    assert(left.filter($"status" === "EXPIRED").count() == 0)
  }

  test("criteria on a non-partition column falls back to anti-rewrite") {
    val root = tmpDir("purge")
    val path = mkPartitioned(root)
    val log = engine(root).run(Seq(cfg("id <= 10")))
    assert(!log.exists(_.logMessage.contains("partition-pruned")))
    assert(spark.read.parquet(path).count() == 90)
  }

  test("mixed partition/data criteria is NOT partition-pruned") {
    val root = tmpDir("purge")
    val path = mkPartitioned(root)
    // half of EXPIRED — dropping the whole directory would over-delete
    val log = engine(root).run(
      Seq(cfg("status = 'EXPIRED' AND id <= 50")))
    assert(!log.exists(_.logMessage.contains("partition-pruned")))
    val left = spark.read.parquet(path)
    assert(left.count() == 75)
    assert(left.filter($"status" === "EXPIRED").count() == 25)
  }

  test("SQL DELETE on a partition column is partition-pruned too (Q3)") {
    val root = tmpDir("purge")
    val path = mkPartitioned(root)
    val log = engine(root).run(Seq(
      cfg("DELETE FROM t WHERE status = 'EXPIRED'", action = "SQL")))
    assert(log.exists(_.logMessage.contains("partition-pruned")))
    assert(spark.read.parquet(path).count() == 50)
  }

  test("audit sink appends Purge_Audit-shaped rows (Q9)") {
    val root = tmpDir("purge")
    mkTable(root)
    val auditPath = s"$root/audit"
    new Purge.Engine(spark, Purge.DirResolver(root),
      auditPath = Some(auditPath))
      .run(Seq(cfg("status = 'EXPIRED'")))
    val audit = spark.read.parquet(auditPath)
    assert(audit.columns.toSet ==
      Set("logTimestamp", "logMessage", "userName", "tableName"))
    assert(audit.count() >= 3) // pre-stats, guard, deleted
    assert(audit.filter(col("logMessage").startsWith("deleted")).count() == 1)
  }
}
