package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One materialized IVF posting — the event a streaming index append
  * emits per arriving vector: the (frozen-centroid) cell it was
  * assigned to, its id and components (carried so a probe over the
  * event sink is self-contained — the carry-vectors discipline of
  * [[BucketDoc]]), and the cell's resident count AFTER insertion
  * (`n_members`, the per-cell list-growth audit). */
case class AnnPosting(cell: Long, target_id: Long, tv: Array[Double],
    n_members: Long)

/** Keyed-store state machine for STREAMING IVF index maintenance:
  * ONE per-cell length counter ([[ValueState]]) under RocksDB — and
  * deliberately nothing else. The emitted posting stream IS the index
  * increment (a sink materializing it holds exactly what the batch
  * path's partitioned-parquet append would hold), so keeping a
  * resident member list in state would double the RocksDB footprint
  * for a value no read path ever touches (the round-10 ADVICE find);
  * `n_members` is derived from the counter alone. Centroids are
  * FROZEN (the standard IVF serving practice: retrain is a scheduled
  * rebuild, not a per-batch event — the
  * [[graft.ops.Similarity.annIvfIndexAppend]] contract), so the
  * assignment happens UPSTREAM as a pure projection against the
  * centroid plan literals and this processor only counts: per-batch
  * I/O is the batch's rows plus one counter read/write per touched
  * cell. Output is emitted LAZILY — the counter flushes when the
  * framework exhausts the iterator, so a hot cell never buffers its
  * micro-batch slice on the executor heap. */
class IvfPostingProcessor
    extends StatefulProcessor[Long, (Long, Long, Array[Double]),
      AnnPosting] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(cell: Long,
      rows: Iterator[(Long, Long, Array[Double])],
      timerValues: TimerValues): Iterator[AnnPosting] = {
    var c = if (count.exists()) count.get() else 0L
    val mapped = rows.map { case (_, id, v) =>
      c += 1
      AnnPosting(cell, id, v, c)
    }
    // Streamed, not pre-materialized: the state commit happens on
    // exhaustion (transformWithState drains the output iterator
    // before committing the batch's state version).
    //
    // FULL-DRAIN CONTRACT (round-11 ADVICE, documented deliberately
    // rather than "fixed"): the counter update fires only when the
    // consumer calls hasNext past the last element. That consumer is
    // `TransformWithStateExec` itself, which ALWAYS drains the
    // processor's iterator to completion before committing the batch
    // (the operator's state-version commit is downstream of the full
    // CompletionIterator; a downstream limit cuts rows AFTER the
    // operator's own drain, not inside it). A flush from close()
    // instead would be wrong here: close() runs once per PARTITION
    // after all keys, outside any key's state scope — `ValueState`
    // handles are key-bound, so the per-cell counter can only be
    // written while its key's rows are being processed, i.e. from
    // this iterator. If a future engine ever stopped draining
    // processors fully, every lazy-emit stateful operator — not just
    // this one — would lose state updates, and the batch≡stream
    // equality oracle (`sim_ann_index_append`) would catch it as a
    // hash mismatch, not a silent skew.
    val st = count
    new Iterator[AnnPosting] {
      private var flushed = false
      override def hasNext: Boolean = {
        val h = mapped.hasNext
        if (!h && !flushed) { st.update(c); flushed = true }
        h
      }
      override def next(): AnnPosting = mapped.next()
    }
  }
}
