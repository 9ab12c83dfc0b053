package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cumulative per-(source, fingerprint) totals — the mergeable state
  * record behind the streaming duplicate-rate scoreboard. `copies`
  * and `bytes` add across batches, `one` re-minimizes; all three are
  * therefore component-wise monotone, so the LAST emission for a key
  * (the one with the highest `copies`) IS the terminal state. */
case class SourceFpTotals(source: String, fp: String, copies: Long,
    bytes: Long, one: Long)

/** Keyed-store state machine for the streaming duplicate-rate
  * scoreboard (round-8 verdict task 1): one [[ValueState]] per
  * (source, fingerprint) key under the RocksDB provider, replacing
  * the re-read-whole-parquet side-state the round-8 `foreachBatch`
  * version paid. Per micro-batch the I/O is the batch's rows plus
  * RocksDB point lookups on the keys that batch touches — O(batch),
  * not O(accumulated state) — and checkpointing ships the RocksDB
  * CHANGELOG (enabled by the gate wrapper), i.e. touched keys only.
  * Exactly-once across retries is Structured Streaming's own state
  * machinery (state version per batch + sink commit log), not a
  * hand-rolled rm/rename. Input rows: (source, fp, n_chars). */
class DupRateProcessor
    extends StatefulProcessor[(String, String), (String, String, Long),
      SourceFpTotals] {
  @transient private var state: ValueState[SourceFpTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SourceFpTotals]("totals",
      Encoders.product[SourceFpTotals], TTLConfig.NONE)

  override def handleInputRows(key: (String, String),
      rows: Iterator[(String, String, Long)],
      timerValues: TimerValues): Iterator[SourceFpTotals] = {
    val prev =
      if (state.exists()) state.get()
      else SourceFpTotals(key._1, key._2, 0L, 0L, Long.MaxValue)
    var c = prev.copies
    var b = prev.bytes
    var o = prev.one
    rows.foreach { case (_, _, n) =>
      c += 1; b += n; if (n < o) o = n
    }
    val next = SourceFpTotals(key._1, key._2, c, b, o)
    state.update(next)
    Iterator.single(next)
  }
}

/** One corpus member of an LSH band bucket: the doc id plus its full
  * shingle-hash set, carried INTO the bucket state so candidate
  * verification is inline (the `sim_dbscan_lsh` carry-vectors lesson:
  * id-only buckets force a second join against a shingle store, which
  * at stream time means re-reading accumulated state). The price is
  * stated: each doc's shingle set is stored once per band (8×); the
  * rent it buys is that a micro-batch touches ONLY the buckets its
  * own docs hash into. */
case class BucketDoc(doc_id: Long, hashes: Array[Long])

/** A verified near-duplicate pair (id_a < id_b, exact shingle-set
  * Jaccard ≥ threshold). */
case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double)

/** Keyed-store state machine for the streaming MinHash-LSH pair miner
  * (round-8 verdict task 1): one [[ListState]] of [[BucketDoc]] per
  * (band, bucket) key under RocksDB. Each arriving (band, bucket,
  * doc_id, hashes) row is paired against the bucket's ACCUMULATED
  * members (new×state) and against earlier arrivals of the same batch
  * in the same bucket (new×new, i<j so once per bucket), verified
  * with exact set Jaccard inline — set semantics to match
  * `array_intersect`/`array_union` in the batch operator — and then
  * appended to the bucket. A pair is therefore DISCOVERED in exactly
  * one micro-batch (the batch its later member arrives in); it may
  * surface in up to `bands` buckets within that batch, and the
  * reader's `distinct()` collapses that bounded (≤8×) multiplicity.
  * Docs never re-arrive, so no pair can recur in a later batch.
  *
  * Per-batch cost: shingling/banding of the batch only, one shuffle
  * of the batch's band keys to the (statically hash-partitioned)
  * state operator, RocksDB point reads on touched buckets. State
  * never streams past the operator.
  *
  * Retention contract: `TTLConfig.NONE` is a STATEMENT, not an
  * omission — dedup state is the corpus universe by definition (a
  * pair can only be discovered if the earlier member is still
  * resident), so the store grows linearly in corpus ingested,
  * measured at ~712 bytes per (band,bucket) member (BASELINE.md
  * "state-footprint-vs-batches" table: sf0.1 reaches 27 MB over 8
  * batches at flat per-batch latency — footprint and latency are
  * decoupled because access is per-key point reads on local SSD;
  * ~5.7 TB fleet-wide for 1 B docs at 8 bands ≈ 6 GB per executor
  * across 1000). A deployment that wants BOUNDED state chooses a
  * horizon instead — pass a finite [[TTLConfig]] so the ListState
  * means "dedup against the trailing N days" — accepting that a
  * duplicate of an expired doc goes undetected: the same
  * recall-for-resources trade the batch gate's band geometry and
  * SemDeDup's cell partitioning already price explicitly. */
/** One resident of a SemDeDup cell: the vector id, components, and
  * precomputed norm, carried into the cell's keyed state so arrival-
  * time θ-checks are inline (the same carry-vectors discipline as
  * [[BucketDoc]]). */
case class CellVec(vec_id: Long, v: Array[Double], n: Double)

/** A SemDeDup verdict event: `dropped = false` rows are cell
  * ASSIGNMENTS (one per vector, emitted on arrival); `dropped = true`
  * rows are KILLS (the larger id of a ≥θ within-cell pair). The
  * reader folds events per vec_id: kept = no kill ever emitted. */
case class SemDedupEvent(vec_id: Long, cell: Long, dropped: Boolean)

/** Keyed-store state machine for STREAMING SemDeDup (round-8 verdict
  * task 8a): one [[ListState]] of [[CellVec]] per cell under RocksDB.
  * Cell assignment happens UPSTREAM as a pure projection (argmax
  * cosine against the k seed vectors baked in as plan literals — the
  * corpus never shuffles for assignment, only for its cell key), so
  * this processor receives rows already keyed by cell. On arrival a
  * vector emits its assignment event, is θ-checked inline against the
  * cell's accumulated residents plus earlier same-batch arrivals
  * (i<j, once per pair), and every ≥θ pair emits a kill for its
  * LARGER id — which makes the final verdict independent of arrival
  * order: whichever side arrives later, the same (min survives) edge
  * is found exactly once, and a resident emitted as an assignment in
  * an earlier batch is retracted by a later kill event rather than by
  * state rewrite. Kill multiplicity (several neighbors killing the
  * same id) collapses in the reader's aggregate.
  *
  * Per-batch cost: the batch's rows + point access to the cells they
  * land in; state never streams past the operator. θ-margin note:
  * planted twins sit at cos ≈ 0.9999 and natural pairs below ~0.52,
  * so the Scala-side sequential-fold cosine cannot disagree with the
  * batch engine's VectorDot at θ = 0.99. */
class SemDedupCellProcessor(theta: Double)
    extends StatefulProcessor[Long, (Long, Long, Array[Double], Double),
      SemDedupEvent] {
  @transient private var residents: ListState[CellVec] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    residents = getHandle.getListState[CellVec]("residents",
      Encoders.product[CellVec], TTLConfig.NONE)

  override def handleInputRows(cell: Long,
      rows: Iterator[(Long, Long, Array[Double], Double)],
      timerValues: TimerValues): Iterator[SemDedupEvent] = {
    val incoming = rows
      .map { case (_, id, v, n) => CellVec(id, v, n) }.toArray
    val out = ArrayBuffer.empty[SemDedupEvent]
    incoming.foreach(x => out += SemDedupEvent(x.vec_id, cell, false))
    def kill(a: CellVec, b: CellVec): Unit =
      if (a.vec_id != b.vec_id) {
        var d = 0.0
        var i = 0
        val va = a.v; val vb = b.v
        while (i < va.length) { d += va(i) * vb(i); i += 1 }
        if (d / (a.n * b.n) >= theta)
          out += SemDedupEvent(math.max(a.vec_id, b.vec_id), cell, true)
      }
    val existing = residents.get()
    while (existing.hasNext) {
      val m = existing.next()
      var i = 0
      while (i < incoming.length) { kill(incoming(i), m); i += 1 }
    }
    var i = 0
    while (i < incoming.length) {
      var j = 0
      while (j < i) { kill(incoming(i), incoming(j)); j += 1 }
      i += 1
    }
    residents.appendList(incoming)
    out.iterator
  }
}

class LshBucketProcessor(threshold: Double,
    ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[(Int, Long), (Int, Long, Long, Array[Long]),
      NearDupPair] {
  @transient private var docs: ListState[BucketDoc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    docs = getHandle.getListState[BucketDoc]("docs",
      Encoders.product[BucketDoc],
      // Finite ttl = the documented trailing-horizon deployment mode
      // made live (round-10 verdict task 3): bucket members expire
      // per-element, so a duplicate of an expired doc passes through
      // undetected — the priced recall-for-resources trade. Requires
      // TimeMode.ProcessingTime upstream.
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(key: (Int, Long),
      rows: Iterator[(Int, Long, Long, Array[Long])],
      timerValues: TimerValues): Iterator[NearDupPair] = {
    val incoming = rows
      .map { case (_, _, id, h) => BucketDoc(id, h) }.toArray
    val incomingSets = incoming.map(d => d.hashes.toSet)
    val out = ArrayBuffer.empty[NearDupPair]
    def verify(aId: Long, aSet: Set[Long], b: BucketDoc,
        bSet: Set[Long]): Unit =
      if (aId != b.doc_id) {
        val inter = aSet.count(bSet.contains)
        val union = aSet.size + bSet.size - inter
        if (union > 0) {
          val j = inter.toDouble / union.toDouble
          if (j >= threshold)
            out += NearDupPair(math.min(aId, b.doc_id),
              math.max(aId, b.doc_id), j)
        }
      }
    val existing = docs.get()
    while (existing.hasNext) {
      val b = existing.next()
      val bSet = b.hashes.toSet
      var i = 0
      while (i < incoming.length) {
        verify(incoming(i).doc_id, incomingSets(i), b, bSet)
        i += 1
      }
    }
    var i = 0
    while (i < incoming.length) {
      var j = 0
      while (j < i) {
        verify(incoming(i).doc_id, incomingSets(i), incoming(j),
          incomingSets(j))
        j += 1
      }
      i += 1
    }
    docs.appendList(incoming)
    out.iterator
  }
}
