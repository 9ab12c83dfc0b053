package graft

import java.math.RoundingMode

import org.scalacheck.Gen

import org.apache.spark.sql.types._

import graft.sources.CsvIngest

/** Property-based checks of the cast semantics (P2–P7) against the
  * reference's contract executed in plain JVM code: parse rules,
  * HALF_UP decimal rescale, invalid → NULL, empty → NULL. ScalaCheck
  * generators drive the inputs; each property evaluates as ONE Spark
  * job over the whole sample batch. */
class CastPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], n: Int = 100): Seq[T] =
    Gen.listOfN(n, g).sample.get

  private def castBatch(raws: Seq[String], dt: DataType): Seq[Any] = {
    import spark.implicits._
    raws.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("i", "_c0")
      .selectExpr("i", s"${CsvIngest.castSql("_c0", dt)} AS v")
      .orderBy("i")
      .collect()
      .map(r => if (r.isNullAt(1)) null else r.get(1)).toSeq
  }

  test("long strings round-trip; garbage and blanks are NULL") {
    val good = sample(Gen.choose(Long.MinValue, Long.MaxValue))
    assert(castBatch(good.map(_.toString), LongType) == good)
    val bad = sample(Gen.alphaStr.suchThat(_.nonEmpty)) ++
      Seq("", "   ", "12x", "9223372036854775808" /* Long.Max + 1 */)
    assert(castBatch(bad, LongType).forall(_ == null))
  }

  test("decimal strings rescale HALF_UP like the reference BigDecimal path") {
    val gen = for {
      unscaled <- Gen.choose(-999999999999L, 999999999999L)
      scale <- Gen.choose(0, 6)
    } yield new java.math.BigDecimal(
      java.math.BigInteger.valueOf(unscaled), scale)
    val bds = sample(gen)
    val got = castBatch(bds.map(_.toPlainString), DecimalType(18, 2))
    bds.zip(got).foreach { case (bd, g) =>
      val expected = bd.setScale(2, RoundingMode.HALF_UP)
      assert(g != null &&
        g.asInstanceOf[java.math.BigDecimal].compareTo(expected) == 0,
        s"in=$bd got=$g expected=$expected")
    }
  }

  test("timestamps parse all declared fraction widths; junk is NULL") {
    val base = "2024-03-05 12:34:56"
    val micros = java.time.LocalDateTime.parse(base.replace(' ', 'T'))
    val inputs = Seq("" -> 0L, ".123" -> 123000000L,
      ".123456" -> 123456000L, ".123456789" -> 123456789L)
    val got = castBatch(inputs.map(base + _._1), TimestampNTZType)
    inputs.zip(got).foreach { case ((suffix, nanos), g) =>
      assert(g != null, s"$base$suffix")
      val ldt = g.asInstanceOf[java.time.LocalDateTime]
      // micros precision: nanos truncated to whole microseconds
      assert(ldt.minusNanos(nanos / 1000 * 1000) == micros,
        s"$base$suffix -> $ldt")
    }
    assert(castBatch(Seq("not a time", "2024-13-45 99:99:99", "", " "),
      TimestampNTZType).forall(_ == null))
  }
}
