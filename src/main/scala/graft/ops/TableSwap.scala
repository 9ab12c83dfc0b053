package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe directory swap for copy-on-write table rewrites.
  *
  * The naive `delete(target); rename(staging, target)` has a data-loss
  * window: a crash between the two calls leaves NEITHER the old table
  * NOR the new one at the target path. The three-step dance here keeps
  * a complete copy of the data on disk at every instant:
  *
  *   1. `rename(target, target.old)`  — old data intact, just aside
  *   2. `rename(staging, target)`     — new data live
  *   3. `delete(target.old)`          — cleanup, safe to lose
  *
  * A crash after (1) leaves the committed table at `.old` (recoverable
  * by renaming back — [[recover]] does exactly that); a crash after
  * (2) leaves the new table live with stale `.old` garbage to sweep.
  * HDFS renames are atomic; object stores emulate rename as
  * copy+delete, so at 100 TB on S3 the real answer is a transactional
  * table format (Delta/Iceberg) whose commit is one small metadata
  * swap — this utility is the plain-parquet/HDFS analogue (reference
  * parity: `AutoPurge.sql:197-201` savepoint/commit).
  */
object TableSwap {

  private def bak(target: String, i: Int): Path = new Path(s"$target.bak$i")

  /** Replace `target` with `staging`, never holding zero copies.
    *
    * With `retain` > 0 the displaced table is kept instead of deleted:
    * the previous contents rotate into `target.bak0` (newest) …
    * `target.bak{retain-1}` (oldest, then pruned) — a keep-last-N
    * savepoint ring that makes a bad rewrite reversible via
    * [[rollback]], the plain-parquet analogue of the reference's
    * `ROLLBACK TO RB_POINT` (`AutoPurge.sql:81-92`). Backups are
    * renames, not copies — retention costs no data movement, only the
    * storage of the retained generations. */
  def swapIn(spark: SparkSession, target: String, staging: String,
      retain: Int = 0): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(staging).getFileSystem(conf)
    val tgt = new Path(target)
    val old = new Path(target + ".old")
    fs.delete(old, true) // stale garbage from an earlier crash-after-(2)
    if (fs.exists(tgt) && !fs.rename(tgt, old))
      throw new java.io.IOException(s"swap: cannot move $tgt aside")
    if (!fs.rename(new Path(staging), tgt)) {
      // Roll back step 1 so the table stays live, then fail loudly.
      fs.rename(old, tgt)
      throw new java.io.IOException(s"swap: cannot move $staging into place")
    }
    if (retain <= 0 || !fs.exists(old)) fs.delete(old, true)
    else {
      fs.delete(bak(target, retain - 1), true)
      for (i <- (retain - 2) to 0 by -1)
        if (fs.exists(bak(target, i)))
          fs.rename(bak(target, i), bak(target, i + 1))
      fs.rename(old, bak(target, 0))
    }
  }

  /** Restore the most recent retained pre-swap copy over the current
    * table; deeper backups shift up one generation. The displaced
    * current contents are held aside during the restore (full copy on
    * disk at every instant, same discipline as [[swapIn]]) and deleted
    * on success. Returns true if a restore happened, false when no
    * backup exists. */
  def rollback(spark: SparkSession, target: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(target).getFileSystem(conf)
    val b0 = bak(target, 0)
    if (!fs.exists(b0)) return false
    val tgt = new Path(target)
    val undone = new Path(target + ".undone")
    fs.delete(undone, true)
    if (fs.exists(tgt) && !fs.rename(tgt, undone))
      throw new java.io.IOException(s"rollback: cannot move $tgt aside")
    if (!fs.rename(b0, tgt)) {
      fs.rename(undone, tgt)
      throw new java.io.IOException(s"rollback: cannot restore $b0")
    }
    fs.delete(undone, true)
    var i = 1
    while (fs.exists(bak(target, i))) {
      fs.rename(bak(target, i), bak(target, i - 1))
      i += 1
    }
    true
  }

  /** Recover from a crash mid-swap: if the target is missing but the
    * `.old` copy exists, the crash hit the window after step (1) —
    * restore the committed table. Returns true if a restore happened. */
  def recover(spark: SparkSession, target: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(target).getFileSystem(conf)
    val tgt = new Path(target)
    val old = new Path(target + ".old")
    if (!fs.exists(tgt) && fs.exists(old)) fs.rename(old, tgt)
    else false
  }
}
