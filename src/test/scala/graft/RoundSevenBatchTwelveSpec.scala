package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Dedup

/** Planted-fixture invariants for content-defined chunking: the
  * insertion-resynchronization property fixed-size blocking lacks. */
class RoundSevenBatchTwelveSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("dedup_cdc_chunks: boundaries resynchronize after an inserted prefix") {
    // Build a long shared segment and prepend DIFFERENT prefixes of
    // different lengths: content-defined boundaries inside the shared
    // tail land at the same CONTENT positions, so both docs emit the
    // same interior chunk fingerprints (fixed-size blocking would
    // shear every block after the insertion).
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val a = "xx " + shared
    val b = "yyyyyyy zz " + shared
    val dir = tmpDir("r7b12_cdc")
    val rows = Seq(Row(1L, a, "en", "s0", a.length.toLong),
      Row(2L, b, "en", "s0", b.length.toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // replicate the chunker in plain Scala to get per-doc chunk sets
    def chunks(text: String): Seq[(Int, Int, Long)] = {
      def roll(s: String): Long =
        s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
      val bs = (8 to text.length).filter { i =>
        roll(text.substring(i - 8, i)) % 64 == 0
      }
      val starts = 0 +: bs
      val ends = bs :+ text.length
      starts.zip(ends).filter { case (s, e) => e > s }
        .map { case (s, e) => (s, e, roll(text.substring(s, e))) }
    }
    val ca = chunks(a)
    val cb = chunks(b)
    val sharedFps = ca.map(_._3).toSet intersect cb.map(_._3).toSet
    assert(sharedFps.nonEmpty,
      "the shared tail must produce identical chunks despite " +
        "different prefixes")

    // and the operator agrees with the reference chunker exactly
    val got = Dedup.cdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    def summarize(cs: Seq[(Int, Int, Long)]) =
      (cs.length.toLong, cs.map(c => (c._2 - c._1).toLong).sum,
        cs.map(c => (c._2 - c._1).toLong).max, cs.map(_._3).sum)
    assert(got(1L) == summarize(ca), s"doc 1: ${got(1L)}")
    assert(got(2L) == summarize(cb), s"doc 2: ${got(2L)}")
  }

  test("dedup_rate_by_source: exact duplicate share and redundant bytes") {
    val dir = tmpDir("r7b12_dr")
    // s0: 3 docs, two identical → 1/3 dup rate, 9 redundant chars
    // s1: all distinct → zero
    val rows = Seq(
      Row(1L, "same text", "en", "s0", 9L),
      Row(2L, "same text", "en", "s0", 9L),
      Row(3L, "different", "en", "s0", 9L),
      Row(4L, "unique a", "en", "s1", 8L),
      Row(5L, "unique b", "en", "s1", 8L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dupRateBySource(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("s0") == ((3L, 2L, 333333L, 9L)))
    assert(got("s1") == ((2L, 2L, 0L, 0L)))
  }
}
