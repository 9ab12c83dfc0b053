package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.TrainingData

/** Training-data curation ops: decontamination, repetition metrics,
  * shard packing. The DuckDB gate proves value parity; these specs
  * prove the *semantic invariants* the gate can't state. */
class TrainingDataSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decontaminate never reports a benchmark document") {
    val out = TrainingData.decontaminate(spark, sf)
    assert(out.filter(col("doc_id") % 101 === 0).count() == 0)
    assert(out.filter(col("n_hit_grams") <= 0).count() == 0)
    assert(out.count() > 0, "synthetic corpus should show some overlap")
  }

  test("bloom-prefiltered decontamination is exact, even when the bloom saturates") {
    val exact = TrainingData.decontaminate(spark, sf).collect().toSet
    // Default geometry (16 KiB, k=3): low false-positive rate.
    val bloom = TrainingData.decontaminateBloom(spark, sf).collect().toSet
    assert(bloom == exact)
    // Degenerate 256-bit filter: nearly every probe is a false
    // positive, so this passes only if the verify join is doing its
    // job — the bloom may only ever shrink candidates, never answers.
    val saturated = TrainingData.decontaminateBloom(spark, sf, mBits = 256, k = 2)
      .collect().toSet
    assert(saturated == exact)
  }

  test("repetition fractions are consistent per-document metrics") {
    val out = TrainingData.repetition(spark, sf).cache()
    try {
      // One row per doc that has at least one 2-gram.
      val docs = Tables.documents(spark, sf)
        .filter(size(split(col("text"), " ")) >= 2).count()
      assert(out.count() == docs)
      val bad = out.filter(
        col("dup_frac") < 0 || col("dup_frac") >= 1 ||
        col("top_frac") <= 0 || col("top_frac") > 1 ||
        col("n_distinct") > col("n_grams") ||
        col("top_cnt") > col("n_grams")).count()
      assert(bad == 0)
      // dup_frac == 0 exactly when every 2-gram is distinct.
      val inconsistent = out.filter(
        (col("dup_frac") === 0) =!= (col("n_distinct") === col("n_grams")))
        .count()
      assert(inconsistent == 0)
    } finally out.unpersist()
  }

  test("pack_shards partitions the corpus into contiguous budgeted shards") {
    val budget = 500L
    val out = TrainingData.packShards(spark, sf, budget = budget)
      .orderBy(col("shard_id")).collect()
    // Every document lands in exactly one shard.
    val totalDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    // Shards are contiguous, non-overlapping doc_id ranges.
    out.sliding(2).foreach {
      case Array(a: Row, b: Row) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ => ()
    }
    // Two-phase prefix sum must equal the naive global window.
    import org.apache.spark.sql.expressions.Window
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        coalesce(sum(col("n_tok")).over(
          Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("cum_before"))
      .groupBy(floor(col("cum_before") / budget).as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .orderBy(col("shard_id")).collect()
    assert(out.map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens"))).toSeq ==
      naive.map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens"))).toSeq)
  }

  test("pii_scrub leaves no residual emails or dashed phones") {
    val out = TrainingData.piiScrub(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("clean").contains("@")).count() == 0)
      assert(out.filter(!col("clean").contains("<EMAIL>")).count() == 0)
      assert(out.filter(!col("clean").contains("<PHONE>")).count() == 0)
      assert(out.filter(col("clean").rlike("[0-9]{3}-[0-9]{4}")).count() == 0)
      assert(out.filter(col("chars_removed") <= 0).count() == 0)
    } finally out.unpersist()
  }

  test("pack_shuffle is a balanced, injective, seeded permutation") {
    val out = TrainingData.packShuffle(spark, sf).collect()
    val totalDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    // Hash-range sharding balances within a loose band.
    val max = out.map(_.getAs[Long]("n_docs")).max
    val min = out.map(_.getAs[Long]("n_docs")).min
    assert(max <= min * 3 + 8, s"shards unbalanced: min=$min max=$max")
    // The multiplier is odd => the permutation key is injective.
    val m = 2654435761L
    val seedHash = (7L * 0x9E3779B9L) % 1048576L
    val keys = Tables.documents(spark, sf)
      .select(((col("doc_id").bitwiseXOR(seedHash) * m) % 4294967296L)
        .as("k"))
    assert(keys.distinct().count() == totalDocs)
    // A different seed produces a different permutation order.
    val k1 = TrainingData.packShuffle(spark, sf, seed = 7L)
      .collect().map(_.getAs[Long]("key_lo")).toSeq
    val k2 = TrainingData.packShuffle(spark, sf, seed = 8L)
      .collect().map(_.getAs[Long]("key_lo")).toSeq
    assert(k1 != k2)
  }

  test("mixtureSample: zero-weight sources dropped, capped rates keep all") {
    val out = TrainingData.mixtureSample(spark, sf,
      Map("src0" -> 0.5, "src1" -> 0.3)).collect()
    val kept = out.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    // Only weighted sources survive.
    assert(kept.keySet.subsetOf(Set("src0", "src1")))
    val srcCounts = Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val total = srcCounts.values.sum.toDouble
    for ((src, n) <- kept) {
      assert(n <= srcCounts(src))
      // rate = min(1, w·total/n_src); when it caps at 1 the source
      // must come through whole (deterministic, not probabilistic).
      val w = Map("src0" -> 0.5, "src1" -> 0.3)(src)
      if (w * total / srcCounts(src) >= 1.0) assert(n == srcCounts(src))
    }
    // Deterministic: a second run returns identical counts.
    val again = TrainingData.mixtureSample(spark, sf,
      Map("src0" -> 0.5, "src1" -> 0.3)).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    assert(again == kept)
  }

  test("fimTransform: reassembling the three spans recovers the original") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val out = TrainingData.fimTransform(docs)
      .join(docs, "doc_id").cache()
    try {
      assert(out.count() == docs.count())
      // Unselected docs pass through byte-identical.
      assert(out.filter(!col("fim") && col("text_out") =!= col("text"))
        .count() == 0)
      // Selected docs: P+M+S (stripped of sentinels, reordered) == text.
      val rebuilt = out.filter(col("fim"))
        .withColumn("pre", regexp_extract(col("text_out"),
          "(?s)^<\\|fim_pre\\|>(.*?)<\\|fim_suf\\|>", 1))
        .withColumn("suf", regexp_extract(col("text_out"),
          "(?s)<\\|fim_suf\\|>(.*?)<\\|fim_mid\\|>", 1))
        .withColumn("mid", regexp_extract(col("text_out"),
          "(?s)<\\|fim_mid\\|>(.*)$", 1))
      assert(rebuilt.count() > 0, "some docs must be FIM-selected")
      assert(rebuilt.filter(
        concat(col("pre"), col("mid"), col("suf")) =!= col("text"))
        .count() == 0)
      // The hash gate selects roughly half the corpus.
      val frac = out.filter(col("fim")).count().toDouble / docs.count()
      assert(frac > 0.3 && frac < 0.7, s"FIM rate $frac outside [0.3,0.7]")
    } finally out.unpersist()
  }

  test("wordGrams handles documents shorter than n") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "two words"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    // Reach the private helper through repetition's public contract:
    // a 1-token doc yields no 2-grams, so it's absent from the output.
    val tmp = tmpDir("td_short")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rep = TrainingData.repetition(spark, tmp).collect()
    assert(rep.map(_.getAs[Long]("doc_id")).toSet == Set(2L, 3L))
    val r3 = rep.find(_.getAs[Long]("doc_id") == 3L).get
    assert(r3.getAs[Long]("n_grams") == 3L)
    assert(r3.getAs[Long]("n_distinct") == 3L)
    assert(r3.getAs[Double]("dup_frac") == 0.0)
  }
}
