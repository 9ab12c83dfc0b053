package graft

import java.sql.{Date => SqlDate, Timestamp => SqlTimestamp}
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroIngest

/** Avro container source/sink: typed roundtrip (incl. nulls, decimal,
  * date, instant + NTZ timestamps, binary), one file per partition
  * with temp+rename visibility, and sync-marker splittability — a
  * forced small split size must fan one file across several input
  * splits without changing the data read. */
class AvroIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("sz", IntegerType),
    StructField("score", DoubleType),
    StructField("name", StringType),
    StructField("ok", BooleanType),
    StructField("amt", DecimalType(10, 2)),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("lts", TimestampNTZType),
    StructField("blob", BinaryType)))

  private def fixture() = {
    val rows = Seq(
      Row(1L, 10, 1.5, "alpha", true,
        new java.math.BigDecimal("12.34"),
        SqlDate.valueOf("2020-01-02"),
        SqlTimestamp.valueOf("2020-01-02 03:04:05.123456"),
        LocalDateTime.parse("2021-06-07T08:09:10.000111"),
        Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null, null, null, null),
      Row(3L, -7, -2.25, "β-unicode", false,
        new java.math.BigDecimal("-0.01"),
        SqlDate.valueOf("1969-12-31"),          // pre-epoch
        SqlTimestamp.valueOf("1969-12-31 23:59:59.999999"),
        LocalDateTime.parse("1969-12-31T23:59:59.000001"),
        Array[Byte]()))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("typed roundtrip preserves every value including nulls") {
    val dir = tmpDir("avro_rt")
    val df = fixture()
    AvroIngest.write(df, dir)
    val back = AvroIngest.read(spark, dir)
    assert(back.schema == StructType(
      schema.map(f => f.copy(nullable = true))))
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until schema.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (u: Array[Byte], v: Array[Byte]) => assert(u.sameElements(v))
          case (u, v) => assert(u == v, s"col ${schema(i).name}")
        }
      }
    }
  }

  test("one container file per partition, no in-progress leftovers") {
    val dir = tmpDir("avro_parts")
    AvroIngest.write(fixture(), dir)
    val files = new java.io.File(dir).listFiles.map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) == 2)
    assert(!files.exists(_.contains("inprogress")))
  }

  test("sync-marker splittability: tiny max split still reads exactly once") {
    val dir = tmpDir("avro_split")
    val big = spark.range(0, 20000, 1, 1) // ONE partition → one file
      .selectExpr("id", "cast(id % 97 as int) as sz",
        "cast(id as double) / 7 as score",
        "repeat('x', 50) as name", "id % 2 = 0 as ok",
        "cast(id as decimal(10,2)) as amt",
        "date_add(date'2020-01-01', cast(id % 300 as int)) as d",
        "timestamp_micros(id * 1000000) as ts",
        "cast(timestamp_micros(id * 1000000) as timestamp_ntz) as lts",
        "cast(null as binary) as blob")
    AvroIngest.write(big, dir)
    assert(new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".avro")) == 1)
    val forced = AvroIngest.read(spark, dir, maxSplitBytes = Some(64 * 1024L))
    assert(forced.rdd.getNumPartitions > 1,
      "small split size must produce multiple input splits for one file")
    assert(forced.count() == 20000L)
    assert(forced.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) == 20000L * 19999L / 2)
  }
}
