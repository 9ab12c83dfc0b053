package graft

import org.apache.spark.sql.types._

import graft.schema.SchemaLoader

class SchemaLoaderSpec extends SparkSpec {

  private def field(json: String): StructField =
    SchemaLoader.fromJson(s"""{"fields": [$json]}""").fields.head

  test("canonical type mapping (SURVEY §1 table)") {
    assert(field("""{"name":"a","type":"INT32"}""").dataType == IntegerType)
    assert(field("""{"name":"a","type":"INT64"}""").dataType == LongType)
    assert(field("""{"name":"a","type":"BINARY","logicalType":"STRING"}""")
      .dataType == StringType)
    assert(field("""{"name":"a","type":"INT32","logicalType":"DATE"}""")
      .dataType == DateType)
    assert(field(
      """{"name":"a","type":"INT64","logicalType":"TIMESTAMP_MICROS"}""")
      .dataType == TimestampNTZType)
    assert(field(
      """{"name":"a","type":"BINARY","logicalType":"DECIMAL",
         "precision":38,"scale":2}""").dataType == DecimalType(38, 2))
  }

  test("repetition: REQUIRED → non-nullable, default OPTIONAL") {
    assert(!field("""{"name":"a","type":"INT32","repetition":"REQUIRED"}""")
      .nullable)
    assert(field("""{"name":"a","type":"INT32","repetition":"OPTIONAL"}""")
      .nullable)
    assert(field("""{"name":"a","type":"INT32"}""").nullable)
  }

  test("invalid repetition degrades to OPTIONAL (SchemaLoader.java:49-52)") {
    assert(field("""{"name":"a","type":"INT32","repetition":"BOGUS"}""")
      .nullable)
  }

  test("unknown logical type falls back to physical (SchemaLoader.java:83-85)") {
    assert(field("""{"name":"a","type":"INT32","logicalType":"WEIRD"}""")
      .dataType == IntegerType)
    assert(field("""{"name":"a","type":"INT64","logicalType":"WEIRD"}""")
      .dataType == LongType)
  }

  test("unknown physical type is a hard error (SchemaLoader.java:65-66)") {
    intercept[IllegalArgumentException] {
      field("""{"name":"a","type":"FLOAT96"}""")
    }
  }

  test("missing fields array is an error") {
    intercept[IllegalArgumentException] {
      SchemaLoader.fromJson("""{"notfields": []}""")
    }
  }
}
