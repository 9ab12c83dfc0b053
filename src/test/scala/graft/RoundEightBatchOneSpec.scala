package graft

import org.apache.spark.sql.functions._

/** Round-8 growth operators: SemDeDup-style cluster-scoped near-dedup
  * and the streaming duplicate-rate scoreboard. */
class RoundEightBatchOneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semdedup cluster: naturals are never dropped; drops are twin-pair " +
      "members; assignment is deterministic") {
    val out = graft.ops.Similarity.semDedupCluster(spark, sf).cache()
    val rows = out.collect()
    // corpus = embeddings (500 at sf0.001) + 100 planted twins
    assert(rows.length == 600, rows.length)
    // THEOREM at θ=0.99: natural pairs top out near cos 0.51, so the
    // only ≥θ pairs are (x, x+10000) twins — a dropped vector must be
    // the LARGER id of a twin pair, i.e. a planted twin.
    val dropped = rows.filter(!_.getBoolean(2)).map(_.getLong(0))
    assert(dropped.forall(_ >= 10000L), dropped.take(5).mkString(","))
    // SemDeDup's documented recall caveat: a twin is dropped IFF it
    // co-clusters with its original. At cos≈0.9999 the argmax-cosine
    // assignment almost always agrees — require most twins caught,
    // and require every drop to be a genuine co-residency.
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dropped.forall(d => cellOf(d) == cellOf(d - 10000L)))
    val coResident = (0L until 100L)
      .count(i => cellOf(i + 10000L) == cellOf(i))
    assert(dropped.length == coResident,
      s"dropped ${dropped.length} but $coResident twins co-cluster")
    assert(coResident >= 90, s"only $coResident/100 twins co-clustered")
    // determinism: a second run reproduces every (vec_id, cell, kept)
    val again = graft.ops.Similarity.semDedupCluster(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    out.unpersist()
  }

  test("semdedup cluster pair stage: equi join on cell, corpus never broadcast") {
    val df = graft.ops.Similarity.semDedupCluster(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the within-cell pair stage must be the hinted shuffle hash join
    // (the nested loops in the tree are all the k-seed argmax
    // broadcast — the nearestCells pattern, 8 rows — whose subtree is
    // duplicated under both sides of the pair join); never a
    // cartesian, and the ONLY broadcast-build frames are the 8-row
    // seed frame and the dropped-id frame
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("streaming dup-rate scoreboard converges to the batch operator") {
    val streamed = graft.ops.Dedup.streamDupRate(spark, sf).collect()
    val batch = graft.ops.Dedup.dupRateBySource(spark, sf).collect()
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)),
      s"stream=${streamed.take(3).mkString(";")} batch=${batch.take(3).mkString(";")}")
  }
}
