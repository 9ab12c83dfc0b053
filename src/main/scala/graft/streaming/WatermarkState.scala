package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Cumulative per-source watermark-detector totals — the mergeable
  * state record behind the streaming watermark-rate scoreboard. All
  * three counters add across batches (component-wise monotone), so
  * the LAST emission for a source — the one with the highest
  * `bigrams` — IS the terminal state, and the reader's max-struct
  * fold recovers it without ordering metadata. */
case class SourceWmTotals(source: String, docs: Long, bigrams: Long,
    green: Long)

/** Keyed-store state machine for the streaming watermark-rate
  * scoreboard: one [[ValueState]] per source under the RocksDB
  * provider (the [[DupRateProcessor]] pattern). Input rows are
  * per-DOCUMENT (source, n_bigrams, n_green) counts computed
  * scan-side as a pure projection — no pre-state aggregation, so the
  * transform is legal in append mode and per-batch I/O is the
  * batch's rows plus point lookups on the sources it touches. */
class WatermarkRateProcessor
    extends StatefulProcessor[String, (String, Long, Long),
      SourceWmTotals] {
  @transient private var state: ValueState[SourceWmTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SourceWmTotals]("wm_totals",
      Encoders.product[SourceWmTotals], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[SourceWmTotals] = {
    val prev =
      if (state.exists()) state.get()
      else SourceWmTotals(key, 0L, 0L, 0L)
    var d = prev.docs
    var b = prev.bigrams
    var g = prev.green
    rows.foreach { case (_, n, gr) => d += 1; b += n; g += gr }
    val next = SourceWmTotals(key, d, b, g)
    state.update(next)
    Iterator.single(next)
  }
}

/** Cumulative per-source decontamination totals — the mergeable state
  * record behind the streaming decontamination scoreboard. All four
  * counters add across batches (component-wise monotone), so the
  * reader's max-struct fold (leading on `docs`) recovers each
  * source's terminal state without ordering metadata. */
case class SourceDecontamTotals(source: String, docs: Long,
    contam: Long, grams: Long, hits: Long)

/** Keyed-store state machine for the streaming decontamination
  * scoreboard: one [[ValueState]] per source (the
  * [[WatermarkRateProcessor]] pattern). Input rows are per-DOCUMENT
  * (source, n_grams, n_hit_grams) counts computed scan-side as a
  * pure projection — bloom prefilter + exact set probe, no join and
  * no pre-state aggregation — so the transform is legal in append
  * mode and per-batch I/O is the batch's rows plus point lookups on
  * the sources it touches. A document counts as contaminated when
  * any of its distinct 3-grams hits the benchmark set. */
class DecontamTotalsProcessor
    extends StatefulProcessor[String, (String, Long, Long),
      SourceDecontamTotals] {
  @transient private var state: ValueState[SourceDecontamTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SourceDecontamTotals]("dc_totals",
      Encoders.product[SourceDecontamTotals], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[SourceDecontamTotals] = {
    val prev =
      if (state.exists()) state.get()
      else SourceDecontamTotals(key, 0L, 0L, 0L, 0L)
    var d = prev.docs
    var c = prev.contam
    var g = prev.grams
    var h = prev.hits
    rows.foreach { case (_, n, hit) =>
      d += 1; if (hit > 0) c += 1; g += n; h += hit
    }
    val next = SourceDecontamTotals(key, d, c, g, h)
    state.update(next)
    Iterator.single(next)
  }
}
