package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Cumulative per-user anomaly-screen state: exact integer count /
  * cents sum / cents sum-of-squares plus the running flag count. All
  * four add across batches (component-wise monotone), so the last
  * emission per user IS the terminal state and the reader's
  * max-struct fold recovers it. */
case class UserAnomTotals(user_id: Long, n: Long, sum: Long,
    sumsq: Long, flags: Long)

/** Keyed-store state machine for STREAMING per-key anomaly
  * detection: one [[ValueState]] per user under RocksDB. Every
  * arriving value is z-tested against the user's state AS OF THE
  * PREVIOUS BATCH — never against same-batch arrivals — via the
  * cross-multiplied integer form
  * `(x·n₀ − s₀)² > 9·(n₀·q₀ − s₀²)` (|z| > 3 with population
  * variance, the control-chart discipline: no division, no sqrt, no
  * doubles). Judging against pre-batch state only makes the flag
  * count independent of within-batch arrival order — Spark hands
  * `handleInputRows` an iterator in partition order, which is not
  * deterministic, but commutative integer sums and an
  * order-free judgment rule are. Input rows: (user_id, cents). */
class AnomalyZProcessor
    extends StatefulProcessor[Long, (Long, Long), UserAnomTotals] {
  @transient private var state: ValueState[UserAnomTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserAnomTotals]("anom_totals",
      Encoders.product[UserAnomTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[UserAnomTotals] = {
    val prev =
      if (state.exists()) state.get()
      else UserAnomTotals(key, 0L, 0L, 0L, 0L)
    val xs = rows.map(_._2).toArray
    var flags = prev.flags
    if (prev.n >= 2L) {
      val varTerm = prev.n * prev.sumsq - prev.sum * prev.sum
      var i = 0
      while (i < xs.length) {
        val d = xs(i) * prev.n - prev.sum
        if (d * d > 9L * varTerm) flags += 1L
        i += 1
      }
    }
    var s = prev.sum
    var q = prev.sumsq
    var i = 0
    while (i < xs.length) { s += xs(i); q += xs(i) * xs(i); i += 1 }
    val next = UserAnomTotals(key, prev.n + xs.length, s, q, flags)
    state.update(next)
    Iterator.single(next)
  }
}
