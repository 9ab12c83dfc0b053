package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, TextAnalysis, TimeSeries, TrainingData}

/** Planted-fixture invariants for the sixth round-6 operator batch:
  * consecutive-doc ROUGE, the padding-waste estimator, OHLC bars,
  * and regexp_extract_all parity. */
class RoundSixBatchSixSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDir(name: String, rows: Seq[Row]): String = {
    val dir = tmpDir(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("eval_rouge_pairs: hand-counted clipped overlap on one pair") {
    // source a: "x y z" vs "x y w" -> R1 clip 2 of 6 -> 666666 ppm;
    // bigrams {x y, y z} vs {x y, y w} -> clip 1 of 4 -> 500000 ppm.
    // source b has one doc -> no pair -> no row.
    val dir = docsDir("r6b6_rouge", Seq(
      Row(1L, "x y z", "en", "a", 5L),
      Row(2L, "x y w", "en", "a", 5L),
      Row(3L, "q q q", "en", "b", 5L)))
    val got = Evaluation.rougePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(("a", 1L, 666666L, 500000L)))
  }

  test("pack_padding_waste: exact overhead of the three strategies") {
    // fit-doc token counts 100, 300, 512 (600 excluded); tok = 912.
    // pad-to-max: 412+212+0 = 624 -> 624e6 div 1536 = 406250 ppm.
    // bucket {128,256,384,512}: 28+84+0 = 112 -> 112e6 div 1024.
    // concat: ceil(912/512)=2 seqs -> 112 pad -> same 109375 ppm.
    def doc(id: Long, n: Int) =
      Row(id, Seq.fill(n)("w").mkString(" "), "en", "s", n.toLong)
    val dir = docsDir("r6b6_pad",
      Seq(doc(1, 100), doc(2, 300), doc(3, 600), doc(4, 512)))
    val got = TrainingData.paddingWaste(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a_pad_to_max", 3L, 624L, 406250L),
      ("b_bucket_pad", 3L, 112L, 109375L),
      ("c_concat_chunk", 2L, 112L, 109375L)))
  }

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("properties", StringType)))

  test("ts_ohlc_bars: open/close by event time with id tie-breaks") {
    val dir = tmpDir("r6b6_ohlc")
    val base = 1700000000000L
    val rows = Seq(
      // user 1, one day: 5.0 then 9.0 then 1.0 then 7.0
      Row(1L, new Timestamp(base), 1L, "a", 5.0, "{}"),
      Row(2L, new Timestamp(base + 60000), 1L, "a", 9.0, "{}"),
      Row(3L, new Timestamp(base + 120000), 1L, "a", 1.0, "{}"),
      Row(4L, new Timestamp(base + 180000), 1L, "a", 7.0, "{}"),
      // user 2: two events at the SAME ts -> event_id breaks the tie
      Row(10L, new Timestamp(base), 2L, "a", 3.0, "{}"),
      Row(11L, new Timestamp(base), 2L, "a", 8.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.ohlcBars(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      (1L, 50000L, 90000L, 10000L, 70000L, 4L),
      (2L, 30000L, 80000L, 30000L, 80000L, 2L)))
  }

  test("text_regex_extract_all: vowel-initial words flattened and " +
    "counted, mid-word suffixes not matched") {
    val dir = docsDir("r6b6_rex", Seq(
      Row(1L, "apple orange kiwi apple under", "en", "s", 29L),
      Row(2L, "grape melon", "en", "s", 11L)))
    val got = TextAnalysis.regexExtractAll(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // kiwi/grape/melon start with consonants; 'orange'/'under' once;
    // nothing matches inside 'grape' (no word-start anchor slip).
    assert(got.toSeq === Seq(("apple", 2L), ("orange", 1L),
      ("under", 1L)))
  }
}
