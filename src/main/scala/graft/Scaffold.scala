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

  /** Run `f`, attributing its wall time to setup. */
  def setup[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.addAndGet(System.nanoTime() - t0)
  }

  /** Return accumulated setup seconds and reset the counter. */
  def drain(): Double = acc.getAndSet(0L) / 1e9
}
