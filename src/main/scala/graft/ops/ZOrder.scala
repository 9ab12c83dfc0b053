package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Z-order (Morton-curve) data layout for multi-column data skipping.
  *
  * At 100 TB a table laid out by one sort key only skips files for
  * predicates on that key; a range predicate on any other column reads
  * every file. Interleaving the bits of two (or more) quantized keys
  * into one Morton code and range-partitioning + sorting by it bounds
  * every file to a small hyper-rectangle of the key space, so parquet
  * footer min/max stats prune files for predicates on EITHER column
  * (the mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Everything here is built-in integer expressions (shift/and/sum) —
  * whole-stage-codegen'd, no UDF — and the identical formula is
  * emitted as oracle SQL, so the curve itself is hash-checked against
  * DuckDB bit-for-bit.
  */
object ZOrder {

  /** Quantize a numeric column into [0, 2^bits) given its value range
    * (at scale: one cheap min/max stats pass, or catalog stats). The
    * float math is a fixed scalar expression — identical text in the
    * oracle — so both engines produce the same bucket ids. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    val buckets = 1L << bits
    least(
      greatest(
        floor((c - lit(min)) / lit(max - min) * lit(buckets.toDouble))
          .cast(LongType),
        lit(0L)),
      lit(buckets - 1))
  }

  /** Morton interleave of N quantized keys, round-robin: bit i of
    * dimension j lands at position i·N + j. N·bits shift-and-mask
    * terms, all codegen'd. Result must fit a signed long. */
  def interleaveN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits exceeds a signed long")
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
          i * dims.size + j)
      }
    }.reduce(_ + _)
  }

  /** Two-key Morton interleave: bit i of x at 2i, of y at 2i+1. */
  def interleave2(x: Column, y: Column, bits: Int): Column =
    interleaveN(Seq(x, y), bits)

  /** The same quantize+interleave as a SQL string (for the oracle). */
  def interleaveSql(xExpr: String, yExpr: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($xExpr >> $i) & 1) << ${2 * i}) + ((($yExpr >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  def quantizeSql(c: String, min: Double, max: Double, bits: Int): String = {
    val buckets = 1L << bits
    s"LEAST(GREATEST(CAST(FLOOR(($c - $min) / ${max - min} * $buckets.0) AS BIGINT), 0), ${buckets - 1})"
  }

  /** Lay `df` out along the curve: range-partition into `numFiles`
    * tasks by z-value (one file each), sort within partitions. The
    * range exchange samples the z distribution, so files get balanced
    * row counts even when the key space is skewed. */
  def layout(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  // -------------------------------------------------------------- //

  private val Bits = 16
  // lineitem value ranges (fixture-wide, all scale factors; at scale
  // these come from a stats pass).
  private val QtyMin = 1.0; private val QtyMax = 50.0
  private val PriceMin = 900.0; private val PriceMax = 105000.0

  /** Gate query: the curve itself. Quantize (l_quantity,
    * l_extendedprice), interleave, return the 100 curve-smallest rows
    * — any bit discrepancy in quantization or interleave surfaces as
    * a hash mismatch. */
  def zorderCurve(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        quantize(col("l_quantity"), QtyMin, QtyMax, Bits).as("xq"),
        quantize(col("l_extendedprice"), PriceMin, PriceMax, Bits).as("yq"))
      .select(col("l_orderkey"), col("l_linenumber"),
        interleave2(col("xq"), col("yq"), Bits).as("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  val zorderCurveSql: String = {
    val xq = quantizeSql("l_quantity", QtyMin, QtyMax, Bits)
    val yq = quantizeSql("l_extendedprice", PriceMin, PriceMax, Bits)
    s"""SELECT l_orderkey, l_linenumber, z FROM (
       |  SELECT l_orderkey, l_linenumber,
       |    ${interleaveSql("xq", "yq", Bits)} AS z
       |  FROM (SELECT l_orderkey, l_linenumber, $xq AS xq, $yq AS yq
       |        FROM lineitem))
       |ORDER BY z, l_orderkey, l_linenumber
       |LIMIT 100""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("zorder_curve" -> (zorderCurve _))
  def oracle: Map[String, String] =
    Map("zorder_curve" -> zorderCurveSql)
}
