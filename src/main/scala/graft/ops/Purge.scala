package graft.ops

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.sources.ParquetSink

/** Config-driven purge engine (SURVEY.md §2.7, Q1–Q9): the Spark-native
  * re-expression of the reference's `AutoPurge.sql` (264 LoC PL/SQL).
  *
  * Semantics reproduced:
  *   - Q1 config dispatch: a `PURGE_CONFIG`-shaped row per table
  *     (`AutoPurge.sql:13-19,67-72`); table selection via `'all'` or a
  *     comma list (`AutoPurge.sql:211-255`).
  *   - Q2 validation: missing tables are skipped with an audit entry
  *     (`AutoPurge.sql:44-57,100-105`).
  *   - Q3 raw-SQL action (`action='SQL'`), with the TRUNCATE fast path
  *     detected for logging (`AutoPurge.sql:129-138`).
  *   - Q4 criteria delete (`action='CRITERIA'`): guard count first —
  *     if `COUNT(*) WHERE criteria` exceeds `maxRecordCount` the purge
  *     aborts (`AutoPurge.sql:141-149`); otherwise the delete runs as
  *     an anti-rewrite: keep `NOT(criteria)`, write, swap
  *     (`AutoPurge.sql:139-201`). On plain Parquet a delete IS a
  *     rewrite; Delta/Iceberg would make it transactional at scale.
  *   - Q5 adaptive parallel degree → left to AQE (SURVEY §4).
  *   - Q6 FK disable/enable → N/A on Spark (no FK enforcement); audited
  *     as a no-op for parity of the audit trail.
  *   - Q7/Q8 savepoint/rollback/dry-run: `dryRun = true` computes and
  *     audits counts without writing (`AutoPurge.sql:77-79`); the
  *     pre-swap staging write is the savepoint analogue.
  *   - Q9 audit trail: every step emits a `Purge_Audit`-shaped row
  *     (`AutoPurge.sql:60-65`), returned to the caller and optionally
  *     appended to an audit parquet table.
  *
  * Scale note: the guard count and the anti-rewrite are both single
  * scans with pushed-down predicates; the rewrite parallelizes over
  * input splits. Nothing here collects rows to the driver.
  */
object Purge extends Logging {

  /** `PURGE_CONFIG` row (FIXTURES.md A3). */
  case class PurgeConfig(
      userName: String,
      tableName: String,
      action: String, // "SQL" | "CRITERIA"
      sqlStatement: String, // raw SQL, or the WHERE criteria
      maxRecordCount: Long)

  /** `Purge_Audit` row (AutoPurge.sql:62-63). */
  case class AuditEvent(
      logTimestamp: Timestamp,
      logMessage: String,
      userName: String,
      tableName: String)

  /** Where a logical table lives. */
  trait TableResolver {
    def pathOf(table: String): Option[String]
  }

  /** Tables as parquet directories under a root: `<root>/<name>`. */
  case class DirResolver(root: String) extends TableResolver {
    def pathOf(table: String): Option[String] = {
      val p = java.nio.file.Paths.get(root, table)
      if (java.nio.file.Files.exists(p)) Some(p.toString) else None
    }
  }

  /** @param retainBackups keep-last-N savepoint ring for every table
    *   rewrite (0 = off): each swap retains the displaced contents as
    *   `<path>.bak0..N-1`, restorable via [[TableSwap.rollback]] —
    *   the reference's savepoint/ROLLBACK parity
    *   (`AutoPurge.sql:81-92`). */
  class Engine(spark: SparkSession, resolver: TableResolver,
      dryRun: Boolean = false, auditPath: Option[String] = None,
      retainBackups: Int = 0) {

    private val events = ArrayBuffer.empty[AuditEvent]

    private def audit(msg: String, user: String, table: String): Unit = {
      val e = AuditEvent(new Timestamp(System.currentTimeMillis()),
        msg, user, table)
      events += e
      logInfo(s"[purge] $table: $msg")
    }

    def auditLog: Seq[AuditEvent] = events.toSeq

    /** Run the engine over `configs`, selecting tables like the
      * reference CLI: `"all"` or `"t1,t2,..."` (case-insensitive). */
    def run(configs: Seq[PurgeConfig], tables: String = "all")
        : Seq[AuditEvent] = {
      val wanted = tables.trim.toLowerCase
      val selected =
        if (wanted == "all") configs
        else {
          val set = wanted.split(",").map(_.trim).filter(_.nonEmpty).toSet
          configs.filter(c => set.contains(c.tableName.toLowerCase))
        }
      selected.foreach(processTable)
      flushAudit()
      auditLog
    }

    private def flushAudit(): Unit = auditPath.foreach { p =>
      import spark.implicits._
      if (events.nonEmpty)
        events.toSeq.toDF().write.mode(SaveMode.Append).parquet(p)
    }

    private def processTable(c: PurgeConfig): Unit = {
      resolver.pathOf(c.tableName) match {
        case None =>
          // Q2: skip-with-log on missing table (AutoPurge.sql:100-105)
          audit(s"table not found, skipping", c.userName, c.tableName)
        case Some(path) =>
          val df = spark.read.parquet(path)
          // A2-style stats probe: pre-purge row count into the audit.
          audit(s"pre-purge rows=${df.count()}", c.userName, c.tableName)
          c.action.toUpperCase match {
            case "SQL"      => runSql(c, path)
            case "CRITERIA" => runCriteria(c, path, df)
            case other =>
              audit(s"unknown action '$other', skipping", c.userName,
                c.tableName)
          }
      }
    }

    /** `DELETE FROM <table> [WHERE <criteria>]` — the one mutating
      * statement shape the reference's SQL-action configs actually
      * carry (`AutoPurge.sql:129-138`), recognized so it MUTATES the
      * parquet table (routed through the same anti-rewrite as the
      * CRITERIA action) instead of no-op'ing against a temp view. */
    private val DeleteStmt =
      """(?is)\A\s*DELETE\s+FROM\s+([A-Za-z_][\w$.]*)\s*(?:WHERE\s+(.+?))?\s*;?\s*\z""".r

    private val MutatingVerbs =
      Set("UPDATE", "INSERT", "MERGE", "DROP", "ALTER", "CREATE")

    private def runSql(c: PurgeConfig, path: String): Unit = {
      val stmt = c.sqlStatement.trim
      if (dryRun) {
        audit(s"DRY RUN: would execute: $stmt", c.userName, c.tableName)
        return
      }
      stmt match {
        case s if s.toUpperCase.startsWith("TRUNCATE") =>
          // TRUNCATE fast path (Q3): overwrite with an empty frame of
          // the same schema — no scan of the data.
          val schema = spark.read.parquet(path).schema
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          replaceTable(path, empty)
          audit("TRUNCATE fast path: table emptied", c.userName,
            c.tableName)
        case DeleteStmt(table, whereOrNull) =>
          val target =
            if (table.equalsIgnoreCase(c.tableName)) Some(path)
            else resolver.pathOf(table)
          target match {
            case None =>
              audit(s"DELETE target '$table' not found, skipping",
                c.userName, c.tableName)
            case Some(p) =>
              val df = spark.read.parquet(p)
              Option(whereOrNull) match {
                case Some(cond) =>
                  val n = df.filter(expr(cond)).count()
                  partitionPrunedDelete(p, cond) match {
                    case Some((dropped, total)) =>
                      audit(s"SQL DELETE (partition-pruned): dropped " +
                        s"$dropped of $total partitions ($n rows); " +
                        s"surviving partitions not rewritten",
                        c.userName, c.tableName)
                    case None =>
                      replaceTable(p, df.filter(!expr(cond)))
                      audit(s"SQL DELETE: removed $n rows matching " +
                        s"'$cond'", c.userName, c.tableName)
                  }
                case None =>
                  val n = df.count()
                  replaceTable(p, df.limit(0))
                  audit(s"SQL DELETE: removed all $n rows", c.userName,
                    c.tableName)
              }
          }
        case s if MutatingVerbs.contains(
            s.split("\\s+").head.toUpperCase) =>
          // Loud skip, not a silent temp-view no-op: plain parquet has
          // no in-place mutation; a table format (Delta/Iceberg) is
          // the scale answer for general DML.
          audit(s"UNSUPPORTED mutating statement on a parquet table, " +
            s"skipping: $stmt", c.userName, c.tableName)
        case _ =>
          spark.read.parquet(path).createOrReplaceTempView(c.tableName)
          spark.sql(stmt)
          audit(s"executed SQL: $stmt", c.userName, c.tableName)
      }
    }

    private def runCriteria(c: PurgeConfig, path: String,
        df: DataFrame): Unit = {
      val criteria = c.sqlStatement
      // A1 guard count, predicate pushed into the scan.
      val toDelete = df.filter(expr(criteria)).count()
      audit(s"guard count: $toDelete rows match '$criteria' " +
        s"(max ${c.maxRecordCount})", c.userName, c.tableName)
      if (toDelete > c.maxRecordCount) {
        audit(s"ABORT: $toDelete exceeds maxRecordCount " +
          s"${c.maxRecordCount}; no rows deleted", c.userName, c.tableName)
      } else if (dryRun) {
        audit(s"DRY RUN: would delete $toDelete rows", c.userName,
          c.tableName)
      } else {
        partitionPrunedDelete(path, criteria) match {
          case Some((dropped, total)) =>
            audit(s"partition-pruned delete: dropped $dropped of $total " +
              s"partitions ($toDelete rows); surviving partitions not " +
              s"rewritten", c.userName, c.tableName)
          case None =>
            val remaining = df.filter(!expr(criteria))
            replaceTable(path, remaining)
            audit(s"deleted $toDelete rows", c.userName, c.tableName)
        }
      }
    }

    private val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"

    /** Decode Hive's %XX path escaping in a partition value. */
    private def unescapeHive(v: String): String = {
      val sb = new StringBuilder(v.length)
      var i = 0
      while (i < v.length) {
        val ch = v.charAt(i)
        if (ch == '%' && i + 2 < v.length) {
          sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(ch); i += 1 }
      }
      sb.toString
    }

    /** Partition-pruned criteria delete: when the table is stored in a
      * Hive layout (`col=value/` directories, e.g. from
      * [[ParquetSink.writePartitioned]]) and the criteria references
      * ONLY partition columns, the delete executes as directory drops —
      * matching partitions are removed wholesale and the surviving
      * partitions' data files are never read or rewritten. The
      * reference's TRUNCATE fast path (`AutoPurge.sql:132-135`) at
      * partition granularity; at 100 TB this turns a full-table
      * rewrite into O(matching partitions) metadata operations.
      *
      * The criteria is evaluated over the partition VALUES with
      * Spark's own expression semantics: directory names are parsed
      * into a one-row-per-partition frame, cast to the types the
      * partitioned read infers, and filtered by the same `expr` the
      * row-level path would use — so the pruned and anti-rewrite paths
      * delete exactly the same rows whenever both apply.
      *
      * Returns Some((dropped, totalPartitions)) when the pruned path
      * applied, None to fall back to the anti-rewrite. */
    private def partitionPrunedDelete(path: String, criteria: String)
        : Option[(Int, Int)] = {
      val root = new HadoopPath(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

      def isPartDir(st: FileStatus): Boolean =
        st.isDirectory && st.getPath.getName.matches("[^=]+=.*")

      def walk(p: HadoopPath, spec: Vector[(String, String)])
          : Vector[(Vector[(String, String)], HadoopPath)] = {
        val parts = fs.listStatus(p).filter(isPartDir)
        if (parts.isEmpty) Vector((spec, p))
        else parts.toVector.flatMap { st =>
          val Array(k, v) = st.getPath.getName.split("=", 2)
          walk(st.getPath, spec :+ (k -> v))
        }
      }

      val leaves = walk(root, Vector.empty).filter(_._1.nonEmpty)
      if (leaves.isEmpty) return None
      val partCols = leaves.head._1.map(_._1)
      if (!leaves.forall(_._1.map(_._1) == partCols)) return None

      val refs = spark.sessionState.sqlParser.parseExpression(criteria)
        .collect { case a: UnresolvedAttribute => a.nameParts.last.toLowerCase }
        .toSet
      if (refs.isEmpty ||
          !refs.subsetOf(partCols.map(_.toLowerCase).toSet)) return None

      val inferred = spark.read.parquet(path).schema
      import spark.implicits._
      val valuesDf = leaves.map { case (spec, p) =>
        (p.toString, spec.map { case (_, v) => unescapeHive(v) })
      }.toDF("_dir", "_vals")
      val typed = partCols.zipWithIndex.foldLeft(valuesDf) {
        case (acc, (c, i)) =>
          val t = inferred.find(_.name.equalsIgnoreCase(c))
            .map(_.dataType).getOrElse(StringType)
          acc.withColumn(c,
            when(col("_vals")(i) === HiveNullPart, lit(null))
              .otherwise(col("_vals")(i)).cast(t))
      }
      val doomed = typed.filter(expr(criteria))
        .select(col("_dir")).collect().map(_.getString(0))
      doomed.foreach(d => fs.delete(new HadoopPath(d), true))
      Some((doomed.length, leaves.size))
    }

    /** Anti-rewrite swap: write survivors to a staging dir, then move
      * it over the table path (the savepoint/commit analogue, Q7). */
    private def replaceTable(path: String, replacement: DataFrame): Unit = {
      val staging = path + ".staging"
      ParquetSink.write(replacement, staging)
      TableSwap.swapIn(spark, path, staging, retain = retainBackups)
    }
  }
}
