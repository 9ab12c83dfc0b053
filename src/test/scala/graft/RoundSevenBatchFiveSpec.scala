package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, ParityQueries, Similarity, TrainingData}

/** Planted-fixture invariants for the fifth round-7 operator batch:
  * Merkle erasure proof, pass@k, randomization test, chat-template
  * rendering, and the ANN recall curve. */
class RoundSevenBatchFiveSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def ordersDir(prefix: String,
      rows: Seq[(Long, Long, String)]): String = {
    val dir = tmpDir(prefix)
    val data = rows.map { case (k, ck, st) =>
      Row(k, ck, st, 100.0,
        Timestamp.valueOf("2024-01-01 00:00:00"), "1-X")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("purge_merkle_proof: deleted keys flip exactly their buckets and the root") {
    // keys 1..10; keys 3 and 7 belong to doomed subjects (custkey%97=0)
    val dir = ordersDir("r7b5_mk", (1L to 10L).map { k =>
      (k, if (k == 3 || k == 7) 97L else k, "F")
    })
    val r = ParityQueries.purgeMerkleProof(spark, dir).head
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L)
    assert(r.getLong(2) == 2L, "two deleted keys")
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L,
      "each doomed key sits in its own bucket; both flip, none else")
    assert(r.getBoolean(7), "roots must differ after erasure")
    assert(r.getBoolean(8), "touched == changed: the proof is exact")
  }

  test("eval_pass_at_k: the Codex estimator on planted tasks") {
    // task 1: n=4 c=1 → pass1=.25, pass4=1 (n−c<4)
    // task 2: n=5 c=0 → pass1=0,  pass4=1−C(5,4)/C(5,4)... = 0
    val dir = ordersDir("r7b5_pk",
      Seq((1L, 1L, "F"), (2L, 1L, "O"), (3L, 1L, "O"), (4L, 1L, "O"),
        (5L, 2L, "O"), (6L, 2L, "O"), (7L, 2L, "O"), (8L, 2L, "O"),
        (9L, 2L, "O")))
    val r = Evaluation.passAtK(spark, dir).head
    assert(r.getLong(0) == 2L)
    // mean pass@1 = (250000 + 0) / 2
    assert(r.getLong(1) == 125000L, s"pass1 ${r.getLong(1)}")
    // task2 pass@4 = 1 − (5·4·3·2)/(5·4·3·2) = 0 → mean = 1e6/2
    assert(r.getLong(2) == 500000L, s"pass4 ${r.getLong(2)}")
    assert(r.getLong(3) == 9L && r.getLong(4) == 1L)
  }

  test("eval_perm_test: valid p-value from 64 reproducible relabelings") {
    val r1 = Evaluation.permTest(spark, "/root/testdata/sf0.001").head
    val r2 = Evaluation.permTest(spark, "/root/testdata/sf0.001").head
    assert(r1 == r2, "hash relabelings must be reproducible")
    assert(r1.getLong(1) <= 64L && r1.getLong(1) > 0L)
    assert(r1.getLong(2) >= 0L && r1.getLong(2) <= r1.getLong(1))
    val p = r1.getLong(3)
    assert(p > 0L && p <= 1000000L, s"p-value ppm $p")
  }

  test("pack_chat_template: rendered bytes and roll hash are exact") {
    val dir = tmpDir("r7b5_ct")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq((0L, "be brief"), (1L, "hi"), (2L, "hello"),
      (3L, "orphan")).map { case (id, t) =>
      Row(id, t, "en", "s0", t.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.chatTemplate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    def roll(sr: String): Long =
      sr.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val rendered =
      "<|system|>be brief<|user|>hi<|assistant|>hello"
    assert(got(0L) == ((3L, rendered.length.toLong, roll(rendered))))
    assert(got(1L)._1 == 1L)
    val orphanRendered = "<|system|>orphan" // doc 3 → role 3 % 3 = system
    assert(got(1L) ==
      ((1L, orphanRendered.length.toLong, roll(orphanRendered))))
  }

  test("sim_recall_curve: all structural facts hold on the real corpus") {
    val rows = Similarity.recallCurve(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"k=${r.getLong(0)}")
    }
  }
}
