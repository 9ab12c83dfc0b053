package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, Graph, LanguageModel, Learn, TextAnalysis}

/** Planted-fixture invariants for the fourth round-7 operator batch:
  * Brier decomposition, Gopher rules, pinball-loss grid, bipartite
  * projection, and perplexity terciles. */
class RoundSevenBatchFourSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsDir(prefix: String,
      rows: Seq[(Long, String, String, Long)]): String = {
    val dir = tmpDir(prefix)
    val data = rows.map { case (id, text, lang, nc) =>
      Row(id, text, lang, "s0", nc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("eval_brier_decomp: two planted bins decompose by hand") {
    // bin 1: f=0.1 ×2 docs, one 'en' → p̄=.1, ō=.5
    // bin 9: f=0.9 ×2 docs, both 'en' → p̄=.9, ō=1
    val dir = docsDir("r7b4_bd", Seq(
      (1L, "x", "en", 400L), (2L, "x", "de", 400L),
      (3L, "x", "en", 3600L), (4L, "x", "en", 3600L)))
    val r = Evaluation.brierDecomposition(spark, dir).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 2L)))
    // rel = (2·(.1−.5)² + 2·(.9−1)²)/4 = (0.32+0.02)/4 = 0.085
    assert(r.getLong(3) == 85000000L, s"rel ${r.getLong(3)}")
    // res = (2·(.5−.75)² + 2·(1−.75)²)/4 = 0.0625
    assert(r.getLong(4) == 62500000L, s"res ${r.getLong(4)}")
    // unc = .75·.25
    assert(r.getLong(5) == 187500000L, s"unc ${r.getLong(5)}")
  }

  test("text_gopher_rules: each named rule fails on its planted doc") {
    val dir = docsDir("r7b4_gr", Seq(
      (1L, "the quick brown fox jumps", "en", 25L), // all pass
      (2L, "!!!! #### $$$$ %%%% ^^^^", "en", 24L),  // symbols+alpha
      (3L, "hi", "en", 2L),                          // word count
      (4L, "aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb " +
        "cccccccccccccccccccc", "en", 62L)))         // mean word len
    val got = TextAnalysis.gopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(!got(2L)._3 && !got(2L)._4 && !got(2L)._5)
    assert(!got(3L)._1 && !got(3L)._5)
    assert(!got(4L)._2 && !got(4L)._5)
  }

  test("learn_quantile_grid: exact pinball losses, argmin near the 0.9 quantile") {
    val dir = tmpDir("r7b4_qg")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val ys = (1 to 16).map(_ * 100L) // cents 100..1600
    val rows = ys.zipWithIndex.map { case (c, i) =>
      Row((i + 1).toLong, 1L, "F", c / 100.0,
        Timestamp.valueOf("2024-01-01 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Learn.quantileGrid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val expect = (1L to 16L).map { i =>
      val c = 100L + (i * 1500L) / 16L
      val loss = ys.map(y =>
        if (y > c) 9L * (y - c) else 1L * (c - y)).sum
      (i, c, loss)
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expect)
    val best = expect.minBy(t => (t._3, t._2))
    assert(got.filter(_._4).map(_._1).toSeq == Seq(best._1))
    // the 0.9-quantile of 1..16 is ~14.5 units: argmin lands on the
    // adjacent grid point (1506 here), not at either extreme
    assert(best._2 > 1300L && best._2 < 1600L)
  }

  test("graph_bipartite_project: shared-user weights and cosine") {
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val dir = tmpDir("r7b4_bp")
    val rows = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).zipWithIndex.map { case ((u, t), i) =>
      Row((i + 1).toLong, Timestamp.valueOf("2024-01-01 10:00:00"),
        u, t, 0.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.bipartiteProject(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    def cos(sh: Long, na: Long, nb: Long): Long =
      math.floor(sh.toDouble / math.sqrt(na.toDouble * nb) * 1e6
        + 0.5).toLong
    assert(got.keySet == Set(("A", "B"), ("A", "C")))
    assert(got(("A", "B")) == ((2L, 3L, 2L, cos(2, 3, 2))))
    assert(got(("A", "C")) == ((1L, 3L, 1L, cos(1, 3, 1))))
  }

  test("text_ppl_buckets: balanced terciles with nondecreasing NLL") {
    val rows = LanguageModel.pplBuckets(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "NTILE balance")
    val means = rows.map(_.getDouble(4))
    assert(means.sliding(2).forall(p => p(0) <= p(1)),
      s"bucket means must be nondecreasing: ${means.toSeq}")
  }
}
