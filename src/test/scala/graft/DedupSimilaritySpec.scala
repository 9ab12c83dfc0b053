package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.ops.{Dedup, DocCorpus, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simhash: small hamming for near-identical, large for unrelated") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"tok$i").mkString(" ") // drop 1 token
    val unrelated = (1 to 60).map(i => s"other$i word$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("id", "text")
      .select($"id", simhash64($"text").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) <= 8)          // near-dup: few bits flip
    assert(ham(m(1L), m(3L)) >= 16)         // unrelated: many bits differ
  }

  test("minhash LSH finds every whitespace/case and drop-last-token dup") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (orig, +10000) exact-dup pair must be recalled
    val wsPairs = (0L until 100L).map(i => (i, i + 10000)).toSet
    assert(wsPairs.subsetOf(pairs), s"missing ${wsPairs.diff(pairs).size} ws pairs")
    // drop-last-token near-dups have jaccard≈(n-3)/n ≈ 0.93+ → recalled
    val dropPairs = (0L until 100L).map(i => (i, i + 20000)).toSet
    assert(dropPairs.subsetOf(pairs),
      s"missing ${dropPairs.diff(pairs).size} drop-token pairs")
  }

  test("minhash signature: identical text → identical signature") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "a completely different sentence here"))
      .toDF("id", "text")
      .select($"id", minhashSignature($"text", k = 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("ann LSH: recalls the high-margin nearest neighbor set") {
    val bf = Similarity.topK(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: must overlap the exact top-5 meaningfully
    val recall = (ann intersect bf).size.toDouble / bf.size
    assert(recall >= 0.2, s"ann recall@5 too low: $recall")
    // and every ann hit must be a real vector pair (sanity)
    assert(ann.forall { case (q, t) => q < 5 && t >= 0 && q != t })
  }

  test("exact dedup: survivors count matches corpus minus dup groups") {
    val survivors = Dedup.exact(spark, dir)
    val corpus = DocCorpus.withDuplicates(spark, dir)
    // every group's survivor is its minimum doc_id and sizes sum to corpus
    assert(survivors.agg(sum("n_dups")).collect()(0).getLong(0) ==
      corpus.count())
    assert(survivors.filter(col("n_dups") >= 2).count() >= 100)
  }
}
