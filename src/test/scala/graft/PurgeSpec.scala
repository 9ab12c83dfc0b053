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
