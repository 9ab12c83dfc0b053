package graft

/** Round-10 batch one: the SemDeDup cross-cell recall audit (round-9
  * verdict task 3) — the number a user needs before trusting
  * cluster-scoped dedup, now measured instead of merely documented. */
class RoundTenBatchOneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semdedup recall audit: three k rows, exact pairs found, " +
      "recall bounded and consistent with the found counts") {
    val rows = graft.ops.Similarity.semDedupRecall(spark, sf)
      .collect()
    assert(rows.map(_.getLong(0)).sameElements(Array(4L, 8L, 16L)))
    val nExact = rows.head.getLong(1)
    // the planted twins guarantee a non-empty exact >=theta pair set
    assert(nExact > 0)
    rows.foreach { r =>
      assert(r.getLong(1) == nExact, "exact set must not vary with k")
      val found = r.getLong(2)
      assert(found >= 0 && found <= nExact, r.toString)
      val ppm = r.getLong(3)
      assert(ppm == found * 1000000L / nExact, r.toString)
      assert(ppm >= 0 && ppm <= 1000000L, r.toString)
    }
  }

  test("memorization risk: tiers are the declared power-of-2 set, " +
      "doc mass equals the >=8-word population, and the planted " +
      "duplicate texts surface in a >=2 tier") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Dedup.memorizationRisk(spark, sf).collect()
    val tiers = rows.map(_.getLong(0))
    assert(tiers.toSet.subsetOf(Set(1L, 2L, 4L, 8L, 16L, 32L)))
    assert(tiers.sameElements(tiers.sorted), tiers.mkString(","))
    val eligible = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 8).count()
    assert(rows.map(_.getLong(1)).sum == eligible,
      s"histogram mass ${rows.map(_.getLong(1)).sum} != $eligible")
    // the corpus plants exact-duplicate texts — their 8-grams occur
    // at least twice corpus-wide, so a >=2 tier must be populated
    assert(rows.exists(r => r.getLong(0) >= 2 && r.getLong(1) > 0),
      rows.mkString(";"))
  }

  test("semdedup recall audit: found pairs at k=8 are at least the " +
      "batch gate's within-cell drops (same seed rule, same " +
      "assignment)") {
    // Every exact >=theta pair that is co-resident at k=8 is exactly
    // a pair the batch gate compares, and each dropped vector
    // witnesses at least one such pair (the one that killed it), so
    // found-at-8 >= drops always. Equality additionally requires
    // every dropped vector to have exactly ONE >=theta partner —
    // true of the planted 1:1 twins but not guaranteed for natural
    // near-pairs, so the invariant pinned here is the inequality.
    val recall8 = graft.ops.Similarity.semDedupRecall(spark, sf)
      .filter("k = 8").collect().head.getLong(2)
    val dropped = graft.ops.Similarity.semDedupCluster(spark, sf)
      .filter("NOT kept").count()
    assert(recall8 >= dropped,
      s"found-at-8 $recall8 < batch drops $dropped")
  }
}
