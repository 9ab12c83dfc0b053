package graft

import org.apache.spark.sql.functions._

/** Round-12 batch: the HNSW composed scale path (round-11 verdict
  * task 1 — the one 100 TB claim that was argued rather than gated).
  * `sim_hnsw_bucketed` builds the navigable graph from LSH
  * bucket-collision candidates instead of the exact all-pairs top-k,
  * runs the SAME beam walk, and gates recall against the exact top-1
  * audit baseline. */
class RoundTwelveBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hnsw bucketed: beam over the LSH-candidate graph finds the " +
      "exact top-1 (recall_ok), ids are valid, out-degree bounded by k") {
    val r = graft.ops.Similarity.hnswBucketed(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 5L, "all 5 declared queries answered")
    assert(row.getBoolean(1), "recall floor (>= 80 % of exact top-1)")
    assert(row.getBoolean(2), "found/exact ids valid non-query nodes")
    assert(row.getBoolean(3), "graph out-degree <= k end-to-end")
  }

  test("hnsw bucketed graph: candidate build is strictly smaller than " +
      "all-pairs and keeps the twin edges the beam needs") {
    val s = spark
    val nodes = graft.ops.Similarity.hnswNodes(s, sf).localCheckpoint()
    val n = nodes.count()
    val bits = math.max(4,
      math.ceil(math.log(n / 24.0) / math.log(2.0)).toInt)
    val edges = graft.ops.Similarity
      .bucketedKnnEdges(nodes, k = 12, nTables = 8, bits = bits, par = 4)
      .collect()
    // the build's whole point: far fewer scored pairs than n^2 — the
    // EDGE set is k-bounded by construction, so assert the bound the
    // gate's degree_bounded also pins, plus non-vacuity
    assert(edges.nonEmpty)
    val deg = edges.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= 12)
    // every query's planted twin (cos >= 0.9999 — collides in
    // essentially every 5-bit table) must appear as a graph edge in
    // at least one direction, else the beam could not find it
    val es = edges.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { q =>
      assert(es.contains((q, q + 10000L)) || es.contains((q + 10000L, q)),
        s"twin edge missing for query $q")
    }
  }

  test("cross-doc exact-substring: the deployment flag excludes the " +
      "planted self-repeats occurrence-mode would mark") {
    val s = spark
    // occurrence-mode verdict over the SAME planted corpus: self-
    // concatenated docs (doc_id % 17 == 3, >= 50 tokens) carry a
    // genuine cyclic within-doc 50-gram repeat, so the two modes MUST
    // differ on that slice and may differ nowhere else
    val cross = graft.ops.Dedup.exactSubstringCrossDoc(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val occ = graft.ops.Dedup.exactSubstringOccurrence(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cross.keySet == occ.keySet)
    val differ = cross.keySet.filter(id => cross(id) != occ(id))
    assert(differ.nonEmpty, "planted self-repeats found by neither mode")
    assert(differ.forall(_ % 17 == 3),
      s"modes differ off the planted slice: $differ")
    differ.foreach { id =>
      assert(occ(id) > cross(id),
        s"occurrence-mode should mark MORE of planted doc $id")
    }
  }

  test("multi-probe LSH at a quarter-size index (2 tables) beats " +
      "single-probe recall on the same index and clears the 0.4 floor") {
    val s = spark
    val bf = graft.ops.Similarity.bruteForcePairs(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "target_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & bf).size.toDouble / bf.size
    }
    val single = recall(graft.ops.Similarity.annLsh(s, sf, nTables = 2))
    val multi = recall(graft.ops.Similarity.annLshMultiProbe(s, sf))
    assert(multi >= 0.4, s"multi-probe recall $multi below gate floor")
    assert(multi > single,
      s"probing sequence bought nothing: multi $multi vs single $single")
  }

  test("layered HNSW: the greedy descent over nested geometric " +
      "layers finds the exact top-1, per-layer degrees bounded") {
    val r = graft.ops.Similarity.hnswLayered(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 5L, "all 5 queries answered")
    assert(row.getBoolean(1), "recall floor (>= 80 % exact top-1)")
    assert(row.getBoolean(2), "found/exact ids valid")
    assert(row.getBoolean(3), "per-layer out-degree <= k")
    assert(row.getBoolean(4), "layer sets strictly nested, non-empty")
  }

  test("streaming HNSW insert: every planted twin attaches to its " +
      "source, the reverse edge survives the receiver prune, degrees " +
      "stay bounded") {
    val rows = graft.ops.Similarity.streamHnswInsert(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"twin of query ${r.getLong(0)} not " +
        "attached to its source")
      assert(r.getBoolean(2), s"reverse edge missing at query ${r.getLong(0)}")
      assert(r.getBoolean(3), "adjacency exceeded m")
    }
  }
}
