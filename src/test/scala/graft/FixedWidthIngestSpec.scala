package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.sources.FixedWidthIngest

/** Offset-bound slicing semantics: short lines, padding, and the
  * shared cast contract (empty→NULL, lenient casts). */
class FixedWidthIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("born", DateType)))
  private val widths = Seq(4, 8, 12)

  private def write(lines: Seq[String]): String = {
    val dir = tmpDir("fw_src")
    Files.write(Paths.get(dir, "a.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("slices by offset; padding trims away; short line → NULL tail") {
    val dir = write(Seq(
      "1   Alice   2001-02-03  ",
      "2   Bob",                  // short: born missing entirely
      "3           2002-03-04  ")) // name all-blank → NULL
    val rows = FixedWidthIngest.read(spark, dir, schema, widths)
      .orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "Alice")
    assert(rows(0).getDate(2).toString == "2001-02-03")
    assert(rows(1).getString(1) == "Bob" && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) &&
      rows(2).getDate(2).toString == "2002-03-04")
  }

  test("lenient cast: a bad date becomes NULL, row survives") {
    val dir = write(Seq("7   X       not-a-date  "))
    val r = FixedWidthIngest.read(spark, dir, schema, widths).collect()(0)
    assert(r.getLong(0) == 7L && r.isNullAt(2))
  }

  test("over-width values truncate on write — the format's contract") {
    import spark.implicits._
    val df = Seq((1L, "name-longer-than-8", "2001-01-01")).toDF(
      "id", "name", "born")
    val out = tmpDir("fw_trunc")
    FixedWidthIngest.write(df, widths, out)
    val r = FixedWidthIngest.read(spark, out, schema, widths).collect()(0)
    assert(r.getString(1) == "name-lon") // truncated at width 8
    assert(r.getDate(2) == null || r.getDate(2).toString == "2001-01-01")
  }

  test("write → read round-trips values including the pad widths") {
    import spark.implicits._
    val df = Seq((10L, "zed", "1999-12-31"), (11L, "", "2000-01-01"))
      .toDF("id", "name", "born")
    val out = tmpDir("fw_rt")
    FixedWidthIngest.write(df, widths, out)
    val back = FixedWidthIngest.read(spark, out, schema, widths)
      .orderBy("id").collect()
    assert(back(0).getLong(0) == 10L && back(0).getString(1) == "zed")
    assert(back(1).isNullAt(1)) // empty string pads to blanks → NULL
    assert(back(1).getDate(2).toString == "2000-01-01")
  }
}
