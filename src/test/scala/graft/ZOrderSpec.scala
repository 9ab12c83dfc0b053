package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Z-order layout: curve correctness and the property it exists for —
  * files become min/max-prunable on BOTH interleaved dimensions, where
  * a single-key sort only prunes its leading key. */
class ZOrderSpec extends SparkSpec {

  test("interleave2 matches a reference Morton encoding") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L))
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = pairs.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 16).as("z"))
      .as[Long].collect()
    assert(got.toSeq == pairs.map { case (x, y) => morton(x, y) })
  }

  test("interleaveN matches reference round-robin encoding (property)") {
    import org.scalacheck.Gen
    import spark.implicits._
    def ref(dims: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap(i => dims.zipWithIndex.map { case (v, j) =>
        ((v >> i) & 1L) << (i * dims.size + j)
      }).sum
    val g = Gen.listOfN(3, Gen.choose(0L, (1L << 20) - 1))
    val triples = Gen.listOfN(200, g).sample.get.map {
      case Seq(a, b, c) => (a, b, c)
      case _ => (0L, 0L, 0L)
    }
    val got = triples.toDF("a", "b", "c")
      .select(ZOrder.interleaveN(
        Seq(col("a"), col("b"), col("c")), 20).as("z"))
      .as[Long].collect().toSeq
    assert(got == triples.map(t => ref(Seq(t._1, t._2, t._3), 20)))
  }

  test("quantize clamps to [0, 2^bits)") {
    import spark.implicits._
    val got = Seq(-5.0, 0.0, 50.0, 100.0, 120.0).toDF("v")
      .select(ZOrder.quantize(col("v"), 0.0, 100.0, 4).as("q"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 8L, 15L, 15L))
  }

  /** Per-file [min,max] of a column across the part files of a dir. */
  private def fileRanges(dir: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  private def touched(ranges: Seq[(Double, Double)], lo: Double, hi: Double): Int =
    ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("z-order layout prunes files on the non-leading dimension") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_quantity"), col("l_extendedprice"))
    val nFiles = 16

    val linearDir = tmpDir("zorder_linear")
    li.repartitionByRange(nFiles, col("l_extendedprice"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(linearDir)

    val zDir = tmpDir("zorder_curve")
    val z = ZOrder.interleave2(
      ZOrder.quantize(col("l_quantity"), 1.0, 50.0, 16),
      ZOrder.quantize(col("l_extendedprice"), 900.0, 105000.0, 16), 16)
    ZOrder.layout(li, z, nFiles).write.mode("overwrite").parquet(zDir)

    // Row counts preserved.
    assert(spark.read.parquet(zDir).count() ==
      spark.read.parquet(linearDir).count())

    // Predicate on l_quantity (the NON-leading key of the linear
    // layout): a narrow band. Linear-by-price layout interleaves all
    // quantities into every file -> touches all 16; z-order confines
    // each file to a quantity sub-range -> touches strictly fewer.
    val linTouched = touched(fileRanges(linearDir, "l_quantity"), 10.0, 12.0)
    val zTouched = touched(fileRanges(zDir, "l_quantity"), 10.0, 12.0)
    assert(linTouched == 16, s"linear layout should touch all files, got $linTouched")
    // Range-sampled file boundaries straddle bit-prefix borders, so
    // pruning is approximate (~half the files at 16 partitions, and
    // proportionally better as file count grows) vs ALL files for the
    // single-key layout. The sampler itself is nondeterministic run to
    // run, so allow a ±2-file wobble around the expected half.
    assert(zTouched <= linTouched / 2 + 2,
      s"z-order should touch ~half the files for a 2/49-wide quantity band, got $zTouched")

    // And the price dimension still prunes too (both layouts do).
    val zPriceTouched = touched(fileRanges(zDir, "l_extendedprice"), 1000.0, 5000.0)
    assert(zPriceTouched < 16, s"price should still prune, got $zPriceTouched")
  }
}
