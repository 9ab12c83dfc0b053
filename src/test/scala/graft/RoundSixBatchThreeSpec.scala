package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Evaluation, Graph, Maintenance, ParityQueries,
  TextAnalysis, TimeSeries}

/** Planted-fixture invariants for the third round-6 operator batch:
  * hapax/Simpson vocabulary profile, Fleiss' kappa, multiclass
  * macro-F1, and the DSAR subject export. */
class RoundSixBatchThreeSpec extends SparkSpec {

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

  test("text_hapax: hand-counted hapax share and Simpson " +
    "repeat-probability") {
    // src a: tokens = [x x y x z] -> vocab 3, hapax {y,z} = 2,
    //   coll = 3*2 = 6, simpson = 6/(5*4) = 0.3 -> 300000 ppm
    // src b: tokens = [w w] -> vocab 1, hapax 0, simpson = 2/2 = 1
    val dir = docsDir("r6b3_hapax", Seq(
      Row(1L, "x x y", "en", "a", 5L),
      Row(2L, "x z", "en", "a", 3L),
      Row(3L, "w w", "en", "b", 3L)))
    val got = TextAnalysis.textHapax(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("a") === ((3L, 5L, 2L, 666666L, 300000L)))
    assert(got("b") === ((1L, 2L, 0L, 0L, 1000000L)))
  }

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  test("eval_fleiss_kappa: hand-folded agreement algebra") {
    // Raters (priority band, price band, key % 3):
    //   order 3: ('1-URGENT', 40000, 3%3=0) -> (0, 0, 0) all agree
    //   order 6: ('3-MEDIUM', 60000, 6%3=0) -> (1, 1, 0) two agree
    //   order 7: ('5-LOW', 160000, 7%3=1)   -> (2, 2, 1) two agree
    // ss: 9, 5, 5 -> S1 = (9-3)+(5-3)+(5-3) = 10, N = 3
    // C_j: cat0 = 4, cat1 = 3, cat2 = 2 -> SC = 16+9+4 = 29
    // num = 3*3*10 - 2*29 = 32, den = 18*9 - 58 = 104
    // kappa_ppm = 32e6 // 104 = 307692
    val dir = tmpDir("r6b3_fleiss")
    val data = Seq(
      Row(3L, 1L, "F", 40000.0, new Timestamp(0L), "1-URGENT"),
      Row(6L, 1L, "F", 60000.0, new Timestamp(0L), "3-MEDIUM"),
      Row(7L, 1L, "F", 160000.0, new Timestamp(0L), "5-LOW"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Evaluation.fleissKappa(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 10L, 29L)))
    // p_bar = 10e6 // 18 = 555555; p_e = 29e6 // 81 = 358024
    assert((r.getLong(3), r.getLong(4), r.getLong(5))
      === ((555555L, 358024L, 307692L)))
  }

  test("eval_macro_f1: per-class counts and the macro averages over " +
    "a planted confusion") {
    // 'the and' -> en; 'der und' -> de; en doc misclassified needs
    // de markers: lang=en text with 'der und' predicts de.
    val dir = docsDir("r6b3_mf1", Seq(
      Row(1L, "the and of", "en", "s", 10L),
      Row(2L, "the and to", "en", "s", 10L),
      Row(3L, "der und das", "en", "s", 11L), // en mislabeled as de
      Row(4L, "der und die", "de", "s", 11L)))
    val got = Evaluation.macroF1(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // de: tp=1 fp=1 fn=0 -> p=500000 r=1000000 f1=666666
    // en: tp=2 fp=0 fn=1 -> p=1000000 r=666666 f1=800000
    assert(got("de") === ((1L, 1L, 0L, 500000L, 1000000L, 666666L)))
    assert(got("en") === ((2L, 0L, 1L, 1000000L, 666666L, 800000L)))
    assert(got("zzz_macro")
      === ((3L, 1L, 1L, 750000L, 833333L, 733333L)))
  }

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_extendedprice", DoubleType)))

  test("purge_subject_export: cross-table manifest gathers exactly " +
    "the subjects' rows with exact cents checksums") {
    val dir = tmpDir("r6b3_dsar")
    // subjects: custkeys 97 and 194; customer 5 is not a subject
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(97L, "a", 0, 10.25, "S"), Row(194L, "b", 0, -3.50, "S"),
      Row(5L, "c", 0, 99.99, "S")), 2), custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // orders: 2 for subject 97, 1 for subject 194, 1 for cust 5
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 97L, "F", 100.00, new Timestamp(0L), "1-URGENT"),
      Row(2L, 97L, "F", 50.50, new Timestamp(0L), "1-URGENT"),
      Row(3L, 194L, "F", 20.00, new Timestamp(0L), "1-URGENT"),
      Row(4L, 5L, "F", 77.77, new Timestamp(0L), "1-URGENT")), 2),
      ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lineitem: order 1 has 2 lines, order 3 has 1, order 4 has 1
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 1L, 1L, 10.00), Row(1L, 2L, 2L, 5.25),
      Row(3L, 3L, 3L, 7.00), Row(4L, 4L, 4L, 9.99)), 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = ParityQueries.purgeSubjectExport(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("customer") === ((2L, 2L, 675L)))   // 10.25 - 3.50
    assert(got("orders") === ((2L, 3L, 17050L)))   // 100 + 50.50 + 20
    assert(got("lineitem") === ((2L, 3L, 2225L)))  // 10 + 5.25 + 7
  }

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def evAt(id: Long, user: Long, hourOfDay: Int): Row =
    Row(id, new Timestamp(19700L * 86400000L + hourOfDay * 3600000L),
      user, "view", 1.0, "{}")

  test("ts_dtw: unrolled recurrence matches an independent fold and " +
    "never exceeds the rigid L1") {
    // user 1: 3 events in segment 0; user 2: the same burst shifted
    // to segment 1; global profile = [1, 1, 0, ...] (integer mean).
    val dir = tmpDir("r6b3_dtw")
    val rows = (1 to 3).map(i => evAt(i, 1L, 0)) ++
      (4 to 6).map(i => evAt(i, 2L, 3))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def dtw(u: Array[Long], g: Array[Long]): Long = {
      val d = Array.ofDim[Long](8, 8)
      for (i <- 0 until 8; j <- 0 until 8) {
        val cost = math.abs(u(i) - g(j))
        d(i)(j) = cost + (
          if (i == 0 && j == 0) 0L
          else if (i == 0) d(0)(j - 1)
          else if (j == 0) d(i - 1)(0)
          else math.min(d(i - 1)(j), math.min(d(i)(j - 1),
            d(i - 1)(j - 1))))
      }
      d(7)(7)
    }
    def l1(u: Array[Long], g: Array[Long]): Long =
      (0 until 8).map(i => math.abs(u(i) - g(i))).sum
    val g = Array(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)
    val u1 = Array(3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    val u2 = Array(0L, 3L, 0L, 0L, 0L, 0L, 0L, 0L)
    val got = TimeSeries.tsDtw(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((dtw(u1, g), l1(u1, g))))
    assert(got(2L) === ((dtw(u2, g), l1(u2, g))))
    assert(got.values.forall { case (d, l) => d <= l })
  }

  test("conv_rowgroup_stats: footer metadata reconciles with the " +
    "planted data and sorted groups do not overlap") {
    val dir = tmpDir("r6b3_rg")
    val rows = (1L to 500L).map(i => evAt(i, i % 7, (i % 24).toInt))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ParityQueries.convRowgroupStats(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((500L, 1L, 500L)))
    assert(r.getBoolean(4)) // sorted write -> non-overlapping stats
  }

  test("maint_wap_publish: poisoned batch is rejected with the live " +
    "table untouched, clean batch publishes") {
    val dir = tmpDir("r6b3_wap")
    val data = (1L to 5L).map(k =>
      Row(k, 1L, "F", 10.0 * k, new Timestamp(0L), "1-URGENT"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Maintenance.wapPublish(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got("1_audit_bad") === ((7L, false)))   // staged 5 + 2
    assert(got("2_audit_clean") === ((7L, true)))  // live still 5
    assert(got("3_published") === ((7L, true)))    // published 5 + 2
  }

  test("graph_conductance: planted two-community walk graph scores " +
    "the cross edge exactly") {
    // Two TRIANGLE walks plus one cross transition. Pair graphs
    // (a<->b) oscillate under synchronous LPA (labels swap every
    // round, returning to singletons after any even iteration
    // count); triangles converge by round 3:
    //   iter1: a=2 b=1 c=1 | d=5 e=4 f=4
    //   iter2: a=1 b=1 c=1 | d=4 e=4 f=4   (stable from here)
    def walk(user: Long, base: Long, steps: Seq[String]): Seq[Row] =
      steps.zipWithIndex.map { case (t, i) =>
        Row(base + i, new Timestamp(1700000000000L + i * 60000L),
          user, t, 1.0, "{}")
      }
    val dir = tmpDir("r6b3_cond")
    val rows = walk(1L, 100, Seq("a", "b", "c", "a", "b", "c", "a")) ++
      walk(2L, 200, Seq("d", "e", "f", "d", "e", "f", "d")) ++
      walk(3L, 300, Seq("c", "d"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Graph.conductance(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // Symmetric directed weights: each triangle edge 2 per direction
    // (12 per triangle), cross c-d 1 per direction; m2 = 26.
    // vol({a,b,c}) = 12 + 1 = 13, cut = 1,
    // cond = 1e6 div min(13, 13) = 76923; symmetric for {d,e,f}.
    assert(got.toSeq === Seq((3L, 13L, 1L, 76923L),
      (3L, 13L, 1L, 76923L)))
  }
}
