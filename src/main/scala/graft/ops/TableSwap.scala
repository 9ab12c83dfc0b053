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

  /** Replace `target` with `staging`, never holding zero copies. */
  def swapIn(spark: SparkSession, target: String, staging: String): Unit = {
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
    fs.delete(old, true)
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
