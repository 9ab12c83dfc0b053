package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Maintenance, Multimodal, TrainingData}

/** Planted-fixture invariants for the third round-7 operator batch:
  * MinHash estimation audit, preference pairs, the compaction
  * planner, and perceptual hashing. */
class RoundSevenBatchThreeSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDir(prefix: String,
      rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir(prefix)
    val data = rows.map { case (id, text, src) =>
      Row(id, text, "en", src, text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_minhash_estimate: identical/disjoint/half-overlap pairs") {
    val same = "alpha beta gamma delta epsilon zeta"
    val other = "one two three four five six"
    val half = "alpha beta gamma delta quux quuz"
    val dir = docsDir("r7b3_mh", Seq(
      (1L, same, "s1"), (21L, same, "s1"),
      (2L, other, "s2"), (22L, same, "s2"),
      (3L, same, "s3"), (23L, half, "s3")))
    val got = Dedup.minhashEstimate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5),
        r.getLong(6)))).toMap
    // identical docs: exact = est = 1
    assert(got(1L) == ((4L, 1000000L, 1000000L)))
    // disjoint shingle sets: exact 0; the 64 minhashes share nothing
    assert(got(2L)._2 == 0L)
    assert(got(2L)._3 == 0L)
    // half-overlapping 3-gram sets: exact = 2/6; estimate within 4σ
    val (inter, exact, est) = got(3L)
    assert(inter == 2L && exact == 333333L)
    assert(math.abs(est - exact) < 250000L, s"est $est vs $exact")
  }

  test("pack_preference_pairs: best pairs with worst, middle unpaired") {
    val dir = docsDir("r7b3_pp", Seq(
      (1L, "a b c d", "s0"),   // ttr 1.0     → rank 1
      (2L, "a a b c", "s0"),   // ttr 750000  → rank 2
      (3L, "a a b b", "s0"),   // ttr 500000  → rank 3 (doc_id tiebreak)
      (4L, "a a a b", "s0"),   // ttr 500000  → rank 4
      (5L, "a a a a", "s0"))) // ttr 250000  → rank 5
    val got = TrainingData.preferencePairs(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6)))
    assert(got.length == 2, "5 docs → 2 pairs, middle doc unpaired")
    assert(got(0) == ((1L, 1L, 5L, 750000L)))
    assert(got(1) == ((2L, 2L, 4L, 250000L)))
  }

  test("compaction planner: prefix-sum bins on a hand inventory and a real listing") {
    import spark.implicits._
    val inv = Seq(("a", 10000L), ("b", 9000L), ("c", 5000L),
      ("d", 2000L)).toDF("file", "bytes")
    val plan = Maintenance.compactionPlanOver(inv, 16384L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(plan == Map(0L -> ((2L, 19000L)), 1L -> ((2L, 7000L))))

    // real filesystem listing: plan actual part files of a written table
    val dir = tmpDir("r7b3_cp")
    graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/t")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen))
    val realInv = files.toSeq.toDF("file", "bytes")
    val target = 64L * 1024
    val real = Maintenance.compactionPlanOver(realInv, target).collect()
    assert(real.map(_.getLong(1)).sum == files.length)
    assert(real.map(_.getLong(2)).sum == files.map(_._2).sum)
    // every bin is within one input file of the target by construction
    real.foreach { r =>
      assert(r.getLong(2) < target + files.map(_._2).max)
    }
  }

  test("multimodal_phash: split-intensity payload sets exactly the bright half") {
    val text = "a" * 32 + "z" * 32 // cells 0-15 mean 97, 16-31 mean 122
    val dir = docsDir("r7b3_ph", Seq(
      (1L, text, "s0"), (2L, text, "s0"),
      (3L, "z" * 32 + "a" * 32, "s0")))
    val got = Multimodal.phash(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val bright = (16 until 32).map(1L << _).sum
    assert(got(1L) == ((bright, 16L, 32L)))
    // identical payloads → identical codes (the dedup-join premise)
    assert(got(2L) == got(1L))
    // mirrored payload lights the other half
    val dark = (0 until 16).map(1L << _).sum
    assert(got(3L) == ((dark, 16L, 32L)))
  }
}
