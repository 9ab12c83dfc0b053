package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, Graph, Maintenance, Multimodal}

/** Planted-fixture invariants for the ninth round-7 operator batch:
  * ANALYZE/CBO stats, span F1, DAG path counts, and media resize. */
class RoundSevenBatchNineSpec extends SparkSpec {

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

  test("maint_analyze_cbo: catalog stats record the true row counts") {
    val sf = "/root/testdata/sf0.001"
    val got = Maintenance.analyzeCbo(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got("nation") ==
      ((graft.Tables.nation(spark, sf).count(), true)))
    assert(got("region") ==
      ((graft.Tables.region(spark, sf).count(), true)))
    assert(got("supplier") ==
      ((graft.Tables.supplier(spark, sf).count(), true)))
  }

  test("eval_span_f1: exact-match spans — boundary drift is a miss") {
    val dir = docsDir("r7b9_sf", Seq(
      (1L, "aa bbbbbbb ccccccc dd eeeee ffffffff")))
    // gold (>5): (1,2), (5,5); pred (>4): (1,2), (4,5)
    val r = Evaluation.spanF1(spark, dir).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((1L, 2L, 2L)))
    assert(r.getLong(3) == 500000L && r.getLong(4) == 500000L &&
      r.getLong(5) == 500000L)
  }

  test("graph_dag_paths: diamond edge counts paths exactly") {
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val dir = tmpDir("r7b9_dp")
    val seqs = Seq((1L, Seq("A", "B")), (2L, Seq("B", "C")),
      (3L, Seq("A", "C")), (4L, Seq("D")))
    val rows = seqs.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) =>
        Row(u * 10 + i, Timestamp.valueOf(s"2024-01-01 10:0$i:00"),
          u, t, 0.0, "{}")
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.dagPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sources A and D; B reachable one way, C two ways (A→C, A→B→C)
    assert(got == Map("A" -> 1L, "B" -> 1L, "C" -> 2L, "D" -> 1L))
  }

  test("multimodal_resize: split-intensity payload averages per cell") {
    val dir = docsDir("r7b9_rz", Seq((1L, "a" * 16 + "z" * 16)))
    val got = Multimodal.resize(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 16)
    (0L to 7L).foreach(c => assert(got(c) == ((2L, 9700L)), s"cell $c"))
    (8L to 15L).foreach(c => assert(got(c) == ((2L, 12200L)), s"cell $c"))
  }
}
