package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DataQuality, Linkage, Maintenance, Relational}

/** Planted-fixture invariants for the fifth round-6 operator batch:
  * orphan-file GC, the Gini concentration index, the MapType HOF
  * surface, and phonetic blocking keys. */
class RoundSixBatchFiveSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def ordersDir(name: String, rows: Seq[Row]): String = {
    val dir = tmpDir(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("maint_orphan_gc: planted writer debris double-counts, GC " +
    "restores exact content") {
    val dir = ordersDir("r6b5_gc", (1L to 5L).map(k =>
      Row(k, k, "F", 10.0 * k, new Timestamp(0L), "1-URGENT")))
    val r = Maintenance.orphanGc(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    assert(r.getBoolean(2))               // hazard was observable
    assert(r.getLong(3) === 1L)           // exactly the orphan deleted
    assert(r.getLong(4) === 5L)           // content restored exactly
  }

  test("dq_gini: hand-folded rank form over a 3-customer spend") {
    // spends (cents): 10000, 10000, 20000 -> n=3, S=40000,
    // sum(i*x) = 10000*(0*2 + 3) + 20000*(2*1 + 1) = 90000,
    // G = 2*90000/(3*40000) - 4/3 = 1/6 -> 166666 ppm floored.
    val dir = ordersDir("r6b5_gini", Seq(
      Row(1L, 1L, "F", 100.0, new Timestamp(0L), "1-URGENT"),
      Row(2L, 2L, "F", 100.0, new Timestamp(0L), "1-URGENT"),
      Row(3L, 3L, "F", 200.0, new Timestamp(0L), "1-URGENT")))
    val r = DataQuality.gini(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((3L, 40000L, 166666L)))
  }

  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  test("q52_map_hof: duplicate line keys pre-summed, values doubled, " +
    "odd keys filtered, size sees the full map") {
    val dir = tmpDir("r6b5_map")
    val rows = Seq((1, 10.0), (2, 20.0), (3, 30.0), (3, 5.0)).map {
      case (ln, q) => Row(1L, 1L, 1L, ln, q, 1.0, 0.0, 0.0, "A", "O",
        new Timestamp(0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), lineitemSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.q52MapHof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // map {1->10, 2->20, 3->35}; n_lines = 3; even keys doubled
    assert(got.toSeq === Seq((1L, 3L, 2, 40L)))
  }

  test("link_phonetic_blocks: sound-alike first words share a key") {
    val dir = tmpDir("r6b5_phon")
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    // small -> S + m,a,l,l = 5,_,4,4 -> "54" -> S540
    // smell -> S + m,e,l,l = 5,_,4,4 -> "54" -> S540 (same block)
    // red   -> R + e,d = _,3 -> "3" -> R300
    val rows = Seq("small ring", "smell bolt", "red widget")
      .zipWithIndex.map { case (n, i) =>
        Row(i.toLong, n, "B", "T", 1, 1.0) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), partSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Linkage.phoneticBlocks(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("S540", 2L, 1L), ("R300", 1L, 0L)))
  }
}
