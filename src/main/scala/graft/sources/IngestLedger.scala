package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental-ingest ledger: exactly-once batch onboarding of an
  * arriving file feed — the operational half of the reference's
  * convert pipeline (its `Main` re-converts the whole directory every
  * run; a production feed needs "process only what's new, survive a
  * crash mid-run").
  *
  * Contract:
  *   - a BATCH is one immediate subdirectory of `srcRoot` (the
  *     "arrival unit" — a dated drop, an upstream commit);
  *   - the LEDGER (`<ledgerPath>`) is a newline list of batch names
  *     already ingested, rewritten atomically (temp + rename, the
  *     [[ParquetSink]] discipline) AFTER the batch data commits;
  *   - each batch lands in its own `targetDir/batch=<name>` subtree
  *     written with OVERWRITE, so a crash between data commit and
  *     ledger update makes the re-run idempotent (the batch is
  *     rewritten in place, never duplicated) — at-least-once ledger
  *     updates compose into exactly-once table state.
  *
  * Scale: discovery is one driver-side metadata listing (O(batches)
  * names, never file contents); each batch ingests through the full
  * distributed read path. The ledger read/write is O(processed
  * batches) text — kilobytes for years of dailies.
  */
object IngestLedger {

  final case class RunReport(newBatches: Seq[String], rowsIngested: Long)

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Batch names already recorded (empty when no ledger exists). */
  def processed(s: SparkSession, ledgerPath: String): Set[String] = {
    val f = fs(s, ledgerPath)
    val p = new Path(ledgerPath)
    if (!f.exists(p)) Set.empty
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Ingest every batch under `srcRoot` not yet in the ledger.
    * `readBatch` maps a batch directory to its DataFrame (CSV with a
    * declared schema, JSONL, Avro — any registered source). */
  def ingest(s: SparkSession, srcRoot: String, ledgerPath: String,
      targetDir: String, readBatch: String => DataFrame): RunReport = {
    val f = fs(s, srcRoot)
    val batches = f.listStatus(new Path(srcRoot))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
    val done = processed(s, ledgerPath)
    val fresh = batches.filterNot(done)
    var rows = 0L
    fresh.foreach { b =>
      val df = readBatch(s"$srcRoot/$b")
      rows += df.count()
      df.write.mode("overwrite").parquet(s"$targetDir/batch=$b")
    }
    // Ledger last, atomically: crash before this line re-runs the
    // overwrite above (idempotent); crash after is a clean commit.
    val tmp = new Path(ledgerPath + ".tmp")
    val out = f.create(tmp, true)
    try out.write(((done.toSeq ++ fresh).sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
    val lf = fs(s, ledgerPath)
    if (lf.exists(new Path(ledgerPath))) lf.delete(new Path(ledgerPath), false)
    lf.rename(tmp, new Path(ledgerPath))
    RunReport(fresh, rows)
  }
}
