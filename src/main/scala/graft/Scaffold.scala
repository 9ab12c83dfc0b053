package graft

import java.util.concurrent.atomic.AtomicLong

/** Accounting for gate-fixture scaffolding (scratch-table copies,
  * CSV exports, bucketed-layout writes) so the benchmark can report
  * setup cost separately from engine cost. Several gate queries must
  * first materialize a mutable copy of an input table (a purge needs a
  * table it is allowed to destroy; a compaction gate needs a
  * deliberately shattered source) — that copy is test scaffolding, not
  * the operator under measurement, and folding it into the timing
  * would distort any baseline comparison.
  *
  * Query code wraps ONLY the fixture work in [[setup]]; the bench
  * drains the accumulator around each measured run. Verify ignores it
  * entirely (correctness doesn't care where time went).
  */
object Scaffold {
  private val acc = new AtomicLong(0L)

  /** Scratch base for gate fixtures and streaming source/sink dirs:
    * tmpfs when the host offers it, else /tmp — the same reasoning as
    * `EventStreams.ckBase` (round 10), now applied to the OTHER side
    * of every replay's I/O. Gate scratch is transient by contract
    * (deleted and rewritten per run, ~1 GB at sf0.1), and each
    * micro-batch of the 27 streaming gates pays parquet-sink commits
    * plus file-source listings against this base — on spinning /tmp
    * that is exactly the host-I/O noise the bench protocol documents
    * for the stream tier. Production callers write to real durable
    * storage; this base is gate-harness scoped. */
  val scratchBase: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_scratch"
    else "/tmp/graft_scratch"
  }

  /** Run `f`, attributing its wall time to setup. */
  def setup[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.addAndGet(System.nanoTime() - t0)
  }

  /** Return accumulated setup seconds and reset the counter. */
  def drain(): Double = acc.getAndSet(0L) / 1e9
}
