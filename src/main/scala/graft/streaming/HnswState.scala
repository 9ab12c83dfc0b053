package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One live-adjacency snapshot event — what a streaming HNSW insert
  * emits for a graph node after a batch touched it: the node, a
  * monotone per-node version ordinal (event-sourced; the reader keeps
  * the max-version row per node), and the node's bounded neighbor
  * list after the batch's attach requests were merged and pruned. */
case class HnswEdgeSet(node_id: Long, version: Long,
    nbrs: Array[Long], sims: Array[Double])

/** Keyed-state HNSW attach (round-11 verdict growth 8c — the
  * live-index complement to [[IvfPostingProcessor]]): key = a graph
  * node, input = attach requests `(node_id, other_id, sim)` from
  * arriving vectors, state = ONE ValueState holding the node's
  * current bounded adjacency `(version, ids, sims)`.
  *
  * Each batch merges the key's requests into the stored list —
  * dedup by other_id, then prune to the `m` best by (sim desc, id
  * asc), the eager both-endpoint form of Malkov & Yashunin's
  * "shrink connections when over capacity" rule — bumps the version,
  * and emits the post-batch snapshot. Merge input is sorted before
  * the prune, so the result is a pure function of the REQUEST SET,
  * independent of partitioning and within-batch arrival order (the
  * ReproCheck contract).
  *
  * Scale: per-batch I/O is one point read + one point write per
  * TOUCHED node — never a state-wide scan — and the stored value is
  * ≤ m (id, sim) pairs (~16·m bytes). At 100 TB the state footprint
  * is O(live graph nodes × m), exactly what any HNSW serving index
  * must hold; RocksDB pages it off-heap and the changelog
  * checkpoint ships only touched keys per batch. */
class HnswAttachProcessor(m: Int)
    extends StatefulProcessor[Long, (Long, Long, Double), HnswEdgeSet] {
  @transient private var adj
      : ValueState[(Long, Array[Long], Array[Double])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    adj = getHandle.getValueState[(Long, Array[Long], Array[Double])](
      "adj", Encoders.product[(Long, Array[Long], Array[Double])],
      TTLConfig.NONE)

  override def handleInputRows(node: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[HnswEdgeSet] = {
    val cur: (Long, Array[Long], Array[Double]) =
      if (adj.exists()) adj.get()
      else (0L, Array.empty[Long], Array.empty[Double])
    val byId = scala.collection.mutable.Map.empty[Long, Double]
    cur._2.indices.foreach(i => byId(cur._2(i)) = cur._3(i))
    rows.foreach { case (_, other, sim) =>
      // max-sim dedup: the same pair can collide in several LSH
      // tables within one batch, or recur across batches
      if (!byId.contains(other) || sim > byId(other)) byId(other) = sim
    }
    val kept = byId.toSeq.sortBy { case (id, sim) => (-sim, id) }.take(m)
    val version = cur._1 + 1L
    adj.update((version, kept.map(_._1).toArray,
      kept.map(_._2).toArray))
    Iterator.single(HnswEdgeSet(node, version,
      kept.map(_._1).toArray, kept.map(_._2).toArray))
  }
}
