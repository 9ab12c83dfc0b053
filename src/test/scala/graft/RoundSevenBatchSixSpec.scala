package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Dedup, ParityQueries, Similarity, TimeSeries}

/** Planted-fixture invariants for the sixth round-7 operator batch:
  * suffix–prefix dedup, the diurnal DFT spectrum, the cosine
  * histogram diagnostic, and the DROPMALFORMED contract. */
class RoundSevenBatchSixSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDir(prefix: String,
      rows: Seq[(Long, String)]): String = {
    val dir = tmpDir(prefix)
    val data = rows.map { case (id, text) =>
      Row(id, text, "en", "s0", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_suffix_prefix: a planted page split is the only pair") {
    val dir = docsDir("r7b6_sp", Seq(
      (1L, "page one ends ABCDEFGHIJKL"),
      (2L, "ABCDEFGHIJKL continues here"),
      (3L, "unrelated document text entirely"),
      (4L, "tiny"))) // below affix length → excluded
    val got = Dedup.suffixPrefixPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 2L, "ABCDEFGHIJKL")))
  }

  test("ts_spectrum: mass at hours 0 and 12 excites exactly k=2 and k=4") {
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val dir = tmpDir("r7b6_sp2")
    val rows = (0 until 8).map { i =>
      val h = if (i % 2 == 0) "00" else "12"
      Row((i + 1).toLong, Timestamp.valueOf(s"2024-01-01 $h:00:0$i"),
        1L, "e", 0.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.tsSpectrum(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // x₀ = x₁₂ = 4: odd harmonics cancel (cos πk flips), even add
    assert(got(1L) == ((0L, 0L, 0L)), s"k=1 ${got(1L)}")
    assert(got(3L) == ((0L, 0L, 0L)), s"k=3 ${got(3L)}")
    assert(got(2L)._1 == 8000000L && got(2L)._3 == 64L, s"k=2 ${got(2L)}")
    assert(got(4L)._1 == 8000000L && got(4L)._3 == 64L, s"k=4 ${got(4L)}")
  }

  test("embed_cos_hist: exhaustive pair accounting on the real sample") {
    val rows = Similarity.cosHist(spark, "/root/testdata/sf0.001")
      .collect()
    val nVec = math.min(64L,
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
    assert(rows.map(_.getLong(1)).sum == nVec * (nVec - 1) / 2,
      "every pair lands in exactly one bin")
    rows.foreach { r =>
      val (bin, n, sum) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(bin >= 0 && bin <= 19)
      // bin means must sit inside the bin's cosine interval (±1 snap)
      val mean = sum.toDouble / n
      assert(mean >= (bin / 10.0 - 1.0) * 1e6 - 1 &&
        mean <= ((bin + 1) / 10.0 - 1.0) * 1e6 + 1, s"bin $bin mean $mean")
    }
  }

  test("conv_jsonl_dropmalformed: truncated records drop, the rest survive") {
    val dir = docsDir("r7b6_dm", (1L to 10L).map(i => (i, s"doc $i")))
    val r = ParityQueries.convJsonlDropMalformed(spark, dir).head
    // doc 10 is truncated mid-object → 9 survivors
    assert(r.getLong(0) == 9L)
    assert(r.getLong(1) == (1L to 9L).sum)
    assert(r.getLong(2) == (1L to 9L).map(i => s"doc $i".length.toLong).sum)
  }
}
