package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** LSH dedup at 40× the fixture corpus (~200k docs): the plan that
  * must hold at 100 TB — signatures via explode + partial-aggregated
  * mins, a (band, bucket) shuffle carrying only keys, exact Jaccard
  * on candidates only — exercised on a corpus where the all-pairs
  * alternative would be 2×10^10 comparisons. Asserts perfect recall
  * of the planted near-dup pairs and no cross-replica false
  * positives. */
class DedupStressSpec extends SparkSpec {

  test("minhash LSH on a 200k-doc corpus: planted pairs recalled, no FPs") {
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    // 40 replicas per doc, each salted with as many distinct junk
    // tokens as the doc has real ones → replica-vs-replica jaccard
    // ≈ n/(n+2n) ≈ 1/3 REGARDLESS of doc length, safely below 0.6
    // (a fixed salt count fails: long docs' replicas share enough
    // base shingles to be genuinely near-dup)
    val nTok = size(filter(split(trim(col("text")), "\\s+"),
      t => length(t) > 0))
    val replicas = base
      .crossJoin(spark.range(40).toDF("rep"))
      .select((col("doc_id") * 100 + col("rep")).as("doc_id"),
        concat(col("text"), lit(" "),
          concat_ws(" ", transform(sequence(lit(1), nTok),
            i => concat(lit("s"), xxhash64(col("doc_id"), col("rep"), i)))))
          .as("text"))
    // planted positives: whitespace/case mutants of replica 0 for the
    // first 100 docs (normalized-identical → jaccard 1.0)
    val planted = replicas.filter(col("doc_id") % 100 === 0)
      .filter(col("doc_id") < 100 * 100)
      .select((col("doc_id") + 1000000).as("doc_id"),
        upper(expr("replace(text, ' ', '  ')")).as("text"))
    val corpus = replicas.union(planted)
    assert(corpus.count() == 40 * base.count() + 100)

    val pairs = Dedup.minhashLshPairs(corpus)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 100)
      .map(i => (i * 100L, i * 100L + 1000000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed ${expected.diff(pairs).size} planted pairs")
    assert(pairs == expected,
      s"${pairs.diff(expected).size} unexpected pairs (cross-replica FPs?)")
  }

  test("band-geometry refinement: 16x2 candidates contain every 8x4 candidate") {
    // A 4-row band collision means 4 consecutive minhashes agree,
    // which implies both of its 2-row halves agree — so halving the
    // band rows (and doubling the band count over the same signature)
    // can only ADD candidates. This is the monotonicity that makes
    // the geometry a pure recall knob: pulling the S-curve left never
    // loses a pair the stricter geometry had.
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def pairSet(bands: Int, rows: Int) =
      Dedup.minhashLshCandidates(corpus, bands, rows)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = pairSet(8, 4)
    val fine = pairSet(16, 2)
    assert(coarse.subsetOf(fine),
      s"${coarse.diff(fine).size} pairs lost by the finer geometry")
  }
}
