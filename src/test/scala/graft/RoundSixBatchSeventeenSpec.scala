package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Graph, ParityQueries}

/** Planted-fixture invariants for the seventeenth round-6 operator
  * batch: Viterbi max-probability paths and the catalog inventory. */
class RoundSixBatchSeventeenSpec extends SparkSpec {

  test("graph_viterbi_path: hand-folded ppm DP with dead-end " +
    "truncation") {
    val dir = tmpDir("r6b17_vit")
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("properties", StringType)))
    def walk(user: Long, base: Long, steps: Seq[String]): Seq[Row] =
      steps.zipWithIndex.map { case (t, i) =>
        Row(base + i, new Timestamp(1700000000000L + i * 60000L),
          user, t, 1.0, "{}")
      }
    // transitions: a->b x2, a->c x1, b->c x1
    val rows = walk(1L, 100, Seq("a", "b", "c")) ++
      walk(2L, 200, Seq("a", "b")) ++
      walk(3L, 300, Seq("a", "c"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.viterbiPath(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    // p(a,b)=666666, p(a,c)=333333, p(b,c)=1e6; c is a dead end so
    // k=3 emits nothing.
    assert(got.toSeq === Seq(
      (1L, "b", 666666L, "a"), (1L, "c", 333333L, "a"),
      (2L, "c", 666666L, "b")))
  }

  test("report_catalog: all ten physical tables inventoried with " +
    "their exact column counts") {
    val got = ParityQueries.reportCatalog(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expectedCols = Map("customer" -> 5L, "documents" -> 5L,
      "embeddings" -> 3L, "events" -> 6L, "lineitem" -> 11L,
      "nation" -> 3L, "orders" -> 6L, "part" -> 6L, "region" -> 2L,
      "supplier" -> 4L)
    assert(got.map(_._1).toSeq === expectedCols.keys.toSeq.sorted)
    got.foreach { case (t, n, c) =>
      assert(n > 0, s"$t is empty")
      assert(c === expectedCols(t), s"$t column count")
    }
  }
}
