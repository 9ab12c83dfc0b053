package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode,
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
  * one posting list ([[ListState]] of vector ids) plus its length
  * ([[ValueState]] — ListState has no O(1) size) per cell under
  * RocksDB. Centroids are FROZEN (the standard IVF serving practice:
  * retrain is a scheduled rebuild, not a per-batch event — the
  * [[graft.ops.Similarity.annIvfIndexAppend]] contract), so the
  * assignment happens UPSTREAM as a pure projection against the
  * centroid plan literals and this processor only appends: per-batch
  * I/O is the batch's rows plus point access to the cells they land
  * in — the standing lists are never re-read, re-shuffled, or
  * rewritten. The emitted posting stream IS the index increment: a
  * sink materializing it holds exactly what the batch path's
  * partitioned-parquet append would hold. */
class IvfPostingProcessor
    extends StatefulProcessor[Long, (Long, Long, Array[Double]),
      AnnPosting] {
  @transient private var members: ListState[Long] = _
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    members = getHandle.getListState[Long]("members",
      Encoders.scalaLong, TTLConfig.NONE)
    count = getHandle.getValueState[Long]("count",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(cell: Long,
      rows: Iterator[(Long, Long, Array[Double])],
      timerValues: TimerValues): Iterator[AnnPosting] = {
    var c = if (count.exists()) count.get() else 0L
    val out = rows.map { case (_, id, v) =>
      members.appendValue(id)
      c += 1
      AnnPosting(cell, id, v, c)
    }.toArray
    count.update(c)
    out.iterator
  }
}
