package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{ParityQueries, StreamingQueries, TrainingData}

/** Planted-fixture invariants for the eleventh round-6 operator
  * batch: event-time state TTL, PII detection with Luhn, and CSV
  * schema inference. */
class RoundSixBatchElevenSpec extends SparkSpec {

  test("stream_state_ttl: every corpus user closes exactly once via " +
    "watermark timeout; the nudge user never appears") {
    val dir = tmpDir("r6b11_ttl")
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("properties", StringType)))
    val base = 1700000000000L
    val rows = Seq(
      Row(1L, new Timestamp(base), 1L, "a", 1.0, "{}"),
      Row(2L, new Timestamp(base + 60000), 1L, "a", 1.0, "{}"),
      Row(3L, new Timestamp(base + 120000), 1L, "a", 1.0, "{}"),
      Row(4L, new Timestamp(base + 30000), 2L, "a", 1.0, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamingQueries.stateTtl(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, base, base + 120000),
      (2L, 1L, base + 30000, base + 30000)))
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("pii_detect: planted PII fires every detector, Luhn rejects " +
    "the invalid card") {
    val dir = tmpDir("r6b11_pii")
    val rows = Seq(
      Row(1L, "hello world", "en", "s", 11L), // gets a planted copy
      Row(25L, "contact bob@test.org", "en", "s", 20L)) // natural email
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.piiDetect(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // planted copy carries 1 email, 1 phone, 2 card-shaped numbers
    // of which exactly one is Luhn-valid (4111111111111111).
    assert(got.toSeq === Seq(
      ("card_like", 1L, 2L), ("card_valid", 1L, 1L),
      ("email", 2L, 2L), ("phone", 1L, 1L)))
  }

  test("conv_csv_infer: headered CSV round-trip infers the expected " +
    "types and preserves content checksums") {
    val dir = tmpDir("r6b11_csv")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val rows = (1L to 3L).map(k =>
      Row(k, 1L, "F", 100.5 * k, new Timestamp(0L), "1"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = ParityQueries.convCsvInfer(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // cents: 10050 + 20100 + 30150 = 60300; keys: 6
    assert(got.toSeq === Seq(
      ("o_orderdate", "timestamp", 6L, 60300L),
      ("o_orderkey", "int", 6L, 60300L),
      ("o_orderstatus", "string", 6L, 60300L),
      ("o_totalprice", "double", 6L, 60300L)))
  }
}
