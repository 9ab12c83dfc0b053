package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Evaluation, Graph, Learn, Maintenance,
  Similarity, TimeSeries, TrainingData}

/** Planted-fixture invariants for the second round-6 operator batch:
  * smoothed/LOO target encoding, hashing-trick featurization, and
  * functional-dependency auditing. */
class RoundSixBatchTwoSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def ordersDir(rows: Seq[(Long, Long, String, String)]): String = {
    val dir = tmpDir("r6b2_orders")
    val data = rows.map { case (k, ck, st, pr) =>
      Row(k, ck, st, 100.0, new Timestamp(1700000000000L), pr)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("learn_target_encode: smoothed and LOO encodings are the " +
    "exact integer floor divisions") {
    // Categories: A = {F, F, O}, B = {O, O}; prior = 2/5, m = 20.
    val dir = ordersDir(Seq(
      (1L, 1L, "F", "A"), (2L, 1L, "F", "A"), (3L, 1L, "O", "A"),
      (4L, 2L, "O", "B"), (5L, 2L, "O", "B")))
    val got = Learn.targetEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // A: enc = (2*5 + 20*2)*1e6 // (5*(3+20)) = 50e6 // 115
    assert(got(1L) === ((434782L, 409090L))) // y=1: loo 45e6 // 110
    assert(got(3L) === ((434782L, 454545L))) // y=0: loo 50e6 // 110
    // B: enc = 40e6 // 110; y=0 loo = 40e6 // 105
    assert(got(4L) === ((363636L, 380952L)))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("learn_feature_hash: polynomial-roll buckets and signs " +
    "reproduce the hand computation") {
    val dir = tmpDir("r6b2_docs")
    val data = Seq(Row(1L, "ab ab ba", "en", "s", 8L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // "ab": h = (0*31+97)*31 + 98 = 3105 -> bucket 33, bit 48 even +1
    // "ba": h = 98*31 + 97 = 3135       -> bucket 63, bit 48 even +1
    val got = Learn.featureHash(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((33L, 2L, 2L), (63L, 1L, 1L)))
  }

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_returnflag", StringType)))

  test("dq_fd_check: planted violation is counted, clean FD holds") {
    val dir = ordersDir(Seq(
      (1L, 7L, "F", "A"), (2L, 7L, "F", "B"), (3L, 8L, "O", "A")))
    val li = Seq(
      Row(1L, 10L, 100L, "A"), Row(1L, 11L, 110L, "A"),
      Row(2L, 10L, 100L, "A"), Row(2L, 12L, 120L, "B"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(li, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = DataQuality.fdCheck(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // orderkey 2 has returnflags {A, B} -> one violating group
    assert(got("l_orderkey->l_returnflag") === ((2L, 1L, 2L, 0L)))
    // every partkey maps to exactly one suppkey -> FD holds
    assert(got("l_partkey->l_suppkey") === ((3L, 0L, 1L, 1L)))
    // custkey 7 ordered at priorities {A, B} -> violated
    assert(got("o_custkey->o_orderpriority") === ((2L, 1L, 2L, 0L)))
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("sim_dbscan: two planted density clusters, border joins the " +
    "adjacent one, isolated point is noise") {
    val dir = tmpDir("r6b2_emb")
    def v(id: Long, x: Double, y: Double) =
      Row(id, Seq(x.toFloat, y.toFloat), 0)
    // Cluster A: three mutually-similar unit vectors near [1,0];
    // 4 = [0.71,0.71] is similar ONLY to vec 3 (cos≈0.93) -> border;
    // 5 = [0,1] sees nothing above 0.9 -> noise; 6,7,8 mirror A.
    val data = Seq(
      v(1, 1.0, 0.0), v(2, 0.98, 0.199), v(3, 0.92, 0.39),
      v(4, 0.71, 0.71), v(5, 0.0, 1.0),
      v(6, -1.0, 0.0), v(7, -0.98, -0.199), v(8, -0.92, -0.39))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.dbscan(spark, dir, eps = 0.9, minPts = 2)
      .collect().map(r =>
        r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("core", 1L)))
    assert(got(2L) === (("core", 1L)))
    assert(got(3L) === (("core", 1L)))
    assert(got(4L) === (("border", 1L)))
    assert(got(5L) === (("noise", -1L)))
    assert(got(6L) === (("core", 6L)))
    assert(got(7L) === (("core", 6L)))
    assert(got(8L) === (("core", 6L)))
  }

  test("pack_interleave: weighted fair-queueing schedule paces " +
    "sources 3:2 at every prefix") {
    val dir = tmpDir("r6b2_inter")
    // src1 suffix 1 -> weight 2 (keys 3,9,15,21,27); src2 suffix 2
    // -> weight 3 (keys 2,6,10,14,18). Merged by key: the exact
    // hand-computed order below.
    val data = (1L to 5L).map(i =>
      Row(i, "t", "en", "src1", 1L)) ++
      (11L to 15L).map(i => Row(i, "t", "en", "src2", 1L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val expect = Seq("src2", "src1", "src2", "src1", "src2", "src2",
      "src1", "src2", "src1", "src1")
    assert(got.map(_._2).toSeq === expect)
    assert(got.map(_._1).toSeq === (1L to 10L))
  }

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventsDir(name: String, rows: Seq[Row]): String = {
    val dir = tmpDir(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def evAt(id: Long, user: Long, hourOfDay: Int,
      tpe: String = "view"): Row =
    Row(id, new Timestamp(19700L * 86400000L + hourOfDay * 3600000L),
      user, tpe, 1.0, "{}")

  test("ts_sax: spiky profile symbolizes d-then-b, flat profile " +
    "is all-c") {
    // user 1: 3 events in segment 0 only -> A_0 = 21, B = 63,
    // z_0 = 2.65 ('d'), others z < 0 shallow ('b').
    // user 2: one event in each of the 8 segments -> B = 0 -> 'c's.
    val rows = (1 to 3).map(i => evAt(i, 1L, i % 3)) ++
      (0 to 7).map(s => evAt(10 + s, 2L, s * 3))
    val dir = eventsDir("r6b2_sax", rows)
    val got = TimeSeries.tsSax(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "dbbbbbbb")
    assert(got(2L) === "cccccccc")
  }

  private def ordersDatedDir(rows: Seq[(Long, Int, Double)]): String = {
    // (orderkey, epoch-day, totalprice)
    val dir = tmpDir("r6b2_holt")
    val data = rows.map { case (k, day, pr) =>
      Row(k, 1L, "F", pr, new Timestamp(day * 86400000L), "A")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("ts_holt: level/trend recurrence and linear forecast match " +
    "the hand fold") {
    // days: 100, 110, 130 -> l = 125, b = 12.5, f(h) = 125 + 12.5h
    val dir = ordersDatedDir(Seq(
      (1L, 19700, 100.0), (2L, 19701, 110.0), (3L, 19702, 130.0)))
    val got = TimeSeries.tsHolt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.length === 7)
    assert(got.head === ((1L, 125.0, 12.5, 137.5)))
    assert(got.last === ((7L, 125.0, 12.5, 212.5)))
  }

  test("eval_kendall: hand-counted concordant/discordant pairs") {
    // cust 1: x=1 y=10000; cust 2: x=2 y=30000; cust 3: x=3 y=20000
    // pairs: (1,2) C, (1,3) C, (2,3) D -> tau = 1/3
    val dir = ordersDatedDir(Seq((1L, 19700, 100.0)))
    val data = Seq(
      Row(1L, 1L, "F", 100.0, new Timestamp(0L), "A"),
      Row(2L, 2L, "F", 150.0, new Timestamp(0L), "A"),
      Row(3L, 2L, "F", 150.0, new Timestamp(0L), "A"),
      Row(4L, 3L, "F", 50.0, new Timestamp(0L), "A"),
      Row(5L, 3L, "F", 50.0, new Timestamp(0L), "A"),
      Row(6L, 3L, "F", 100.0, new Timestamp(0L), "A"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Evaluation.kendallGate(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 1L, 0L, 0L, 3L)))
    assert(r.getLong(5) === 333333L)
  }

  test("graph_topo_layers: longest-path waves over the planted DAG") {
    // walks: a->b->d, a->c, c->b (dropped: c>b), b->c
    // edges a->b, b->d, a->c, b->c -> layers a=0 b=1 c=2 d=2
    def walk(user: Long, base: Long, steps: Seq[String]): Seq[Row] =
      steps.zipWithIndex.map { case (t, i) =>
        Row(base + i, new Timestamp(1700000000000L + i * 60000L),
          user, t, 1.0, "{}")
      }
    val dir = eventsDir("r6b2_topo",
      walk(1L, 100, Seq("a", "b", "d")) ++
      walk(2L, 200, Seq("a", "c")) ++
      walk(3L, 300, Seq("c", "b")) ++
      walk(4L, 400, Seq("b", "c")))
    val got = Graph.topoLayers(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 2L))
  }

  test("dq_table_checksum: order-invariant, single-value-sensitive") {
    val liRows = Seq(
      Row(1L, 1, 100.0), Row(1L, 2, 200.0), Row(2L, 1, 300.0))
    val liSchema2 = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_extendedprice", DoubleType)))
    def write(dir: String, li: Seq[Row], parts: Int,
        oPrice: Double): Unit = {
      spark.createDataFrame(
        spark.sparkContext.parallelize(li, parts), liSchema2)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(7L, 1L, "F", oPrice, new Timestamp(0L), "A")), 1),
        ordersSchema)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
    val d1 = tmpDir("r6b2_ck1"); val d2 = tmpDir("r6b2_ck2")
    val d3 = tmpDir("r6b2_ck3")
    write(d1, liRows, 1, 10.0)
    write(d2, liRows.reverse, 3, 10.0) // same rows, order+layout differ
    write(d3, liRows.updated(0, Row(1L, 1, 100.01)), 1, 10.0)
    def fps(d: String) = DataQuality.tableChecksum(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(fps(d1) === fps(d2))
    val (a, b) = (fps(d1).head, fps(d3).head)
    assert(a._3 === b._3)     // keys unchanged
    assert(a._4 === b._4 - 1) // one cent moved
  }

  test("conv_csv_multichar: || delimiter with embedded | survives " +
    "the round-trip") {
    val dir = tmpDir("r6b2_mc")
    val data = Seq(
      Row(1L, 1L, "O", 10.0, new Timestamp(0L), "1-URGENT"),
      Row(2L, 1L, "F", 20.5, new Timestamp(0L), "2-HIGH"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ops.ParityQueries.convCsvMultichar(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 0L, 3050L, 2L)))
  }

  test("purge_crypto_shred: decode through surviving keys matches " +
    "plaintext, shredded rows drop out") {
    val dir = tmpDir("r6b2_shred")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val data = Seq(
      Row(1L, "a", 0, 100.00, "SEG1"),
      Row(10L, "b", 0, 55.25, "SEG1"), // key shredded
      Row(2L, "c", 0, -10.50, "SEG2")) // negative balance round-trips
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = ops.ParityQueries.purgeCryptoShred(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("SEG1") === ((2L, 1L, 10000L, 0L)))
    assert(got("SEG2") === ((1L, 0L, -1050L, 0L)))
  }

  test("eval_isotonic: PAV pools the violating pair exactly") {
    // bins (n, pos): b0 (2,0) b1 (2,2) b2 (2,1) -> rates 0, 1, .5
    // PAV pools bins 1-2 to 3/4: iso = [0, 750000, 750000]
    val dir = tmpDir("r6b2_iso")
    def doc(id: Long, chars: Long, en: Boolean) =
      Row(id, "t", if (en) "en" else "de", "s", chars)
    val data = Seq(
      doc(1, 100, false), doc(2, 150, false),
      doc(3, 500, true), doc(4, 550, true),
      doc(5, 900, true), doc(6, 950, false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Evaluation.isotonicGate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 0L, 1L -> 750000L, 2L -> 750000L))
  }

  test("eval_wilcoxon: doubled average ranks for the tied pair") {
    // diffs: +10000, -5000, +5000 (zero diff dropped)
    // rank2(|5000|) = 3 each, rank2(10000) = 6
    // W+x2 = 3 + 6 = 9, W-x2 = 3, check = 12 = 2 * n(n+1)/2
    def o(k: Long, ck: Long, year: Int, price: Double) =
      Row(k, ck, "F", price,
        Timestamp.valueOf(s"$year-06-01 00:00:00"), "A")
    val dir = tmpDir("r6b2_wilcox")
    val data = Seq(
      o(1, 1, 1996, 100.0),
      o(2, 2, 1999, 50.0),
      o(3, 3, 1996, 30.0), o(4, 3, 1999, 30.0),
      o(5, 4, 1996, 50.0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Evaluation.wilcoxonGate(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 9L, 3L, 12L)))
  }

  test("stream_idempotent_sink: redelivered batches are swallowed, " +
    "totals stay exactly-once") {
    val dir = tmpDir("r6b2_idem")
    val rows = Seq(
      Row(2L, new Timestamp(0L), 1L, "A", 1.5, "{}"),
      Row(4L, new Timestamp(0L), 1L, "A", 2.5, "{}"),
      Row(1L, new Timestamp(0L), 1L, "A", 10.0, "{}"),
      Row(3L, new Timestamp(0L), 1L, "B", 4.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Maintenance.idempotentSink(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doubled counts would read A -> 6 / B -> 2; exactly-once is 3/1
    assert(got("A") === ((3L, 140000L, 2L))) // 14.0 summed, 2 batches
    assert(got("B") === ((1L, 40000L, 1L)))  // odd-only type
  }

  test("dq_l_diversity: k-anonymous group with one sensitive band " +
    "lands at l=1") {
    val dir = tmpDir("r6b2_ldiv")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val data = Seq(
      Row(1L, "a", 0, 500.0, "SEG1"), Row(2L, "b", 0, 700.0, "SEG1"),
      Row(3L, "c", 1, 500.0, "SEG1"), Row(4L, "d", 1, 1500.0, "SEG1"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = DataQuality.lDiversity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L))))
  }

  test("sim_ivf_nprobe_sweep: nested probes keep every structural " +
    "fact true on the real corpus") {
    val got = Similarity.ivfNprobeSweep(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    assert(got.forall(r => r.getBoolean(1) && r.getBoolean(2) &&
      r.getBoolean(3)))
  }

  test("ts_hampel: spike repaired to the window median, MAD-zero " +
    "window still flags") {
    // hourly counts 1,1,9,1,1 -> the full-window point (hour 2) has
    // med 1, mad 0, |9-1| > 0 -> outlier, repaired to 1
    var id = 0L
    val rows = Seq(0, 1, 2, 3, 4).flatMap { h =>
      val n = if (h == 2) 9 else 1
      (1 to n).map { _ => id += 1; evAt(id, 1L, h) }
    }
    val dir = eventsDir("r6b2_hampel", rows)
    val got = TimeSeries.tsHampel(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((9L, 1L, 0L, 1L, 1L)))
  }

  test("dq_inclusion_dep: orphan child keys break the inclusion, " +
    "clean candidates hold") {
    val dir = tmpDir("r6b2_ind")
    val li = Seq(
      Row(1L, 10L, 100L, "A"), Row(2L, 10L, 100L, "A"),
      Row(5L, 11L, 100L, "A")) // orderkey 5 has no parent order
    spark.createDataFrame(
      spark.sparkContext.parallelize(li, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1L, "F", 10.0, new Timestamp(0L), "A"),
        Row(2L, 1L, "F", 10.0, new Timestamp(0L), "A")), 1),
      ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "c")), 1), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val supSchema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(100L, "s")), 1), supSchema)
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = DataQuality.inclusionDep(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("lineitem.l_orderkey<=orders.o_orderkey")
      === ((3L, 1L, 0L)))
    assert(got("orders.o_custkey<=customer.c_custkey")
      === ((1L, 0L, 1L)))
    assert(got("lineitem.l_suppkey<=supplier.s_suppkey")
      === ((1L, 0L, 1L)))
  }

  test("purge_legal_hold: held customer's matching rows survive " +
    "the on-disk purge") {
    val dir = tmpDir("r6b2_hold")
    def o(k: Long, ck: Long, year: Int) =
      Row(k, ck, "F", 10.0,
        Timestamp.valueOf(s"$year-06-01 00:00:00"), "A")
    // matches criteria (<1996): orders 1 (cust 97, HELD), 2 (cust 3)
    // kept regardless: order 3 (1999)
    val data = Seq(o(1, 97, 1995), o(2, 3, 1995), o(3, 3, 1999))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ops.ParityQueries.purgeLegalHold(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 2L, 1L, 1L, 2L)))
  }

  test("pack_resume_cursor: cursor hops tile the key space without " +
    "overlap and stop at exhaustion") {
    val dir = tmpDir("r6b2_cursor")
    val data = (1L to 250L).map(i => Row(i, "t", "en", "s", 1L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 3), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.resumeCursor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 100L, 1L, 100L), (1L, 100L, 101L, 200L),
      (2L, 50L, 201L, 250L)))
  }

  test("maint_partition_evolution: month dirs appear and the " +
    "re-read prunes on the partition column") {
    val dir = tmpDir("r6b2_pe")
    val rows = Seq(
      evAt(1, 1, 5), evAt(2, 1, 6),
      Row(3L, Timestamp.valueOf("2024-02-10 12:00:00"), 2L, "view",
        1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Maintenance.partitionEvolution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq.sorted === Seq(("2023-12", 2L), ("2024-02", 1L)))
    val out = s"${graft.Scaffold.scratchBase}/" +
      s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}/ev_by_month"
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("month=")))
    val pruned = spark.read.parquet(out)
      .filter(col("month") === "2024-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("month"))
  }
}
