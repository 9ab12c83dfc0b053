package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationPipeline, DataQuality, Dedup, Graph, Relational,
  Similarity, TextAnalysis, TrainingData}

/** Unit fixtures + brute-force cross-checks for the second round-4
  * operator batch (rolling distinct, Benford, token budget, span
  * coverage, random projection). Each corpus-gated operator is also
  * re-derived here driver-side on sf0.001 so the distributed plan is
  * checked against an independent sequential computation, not just
  * the DuckDB oracle. */
class RoundFourBatchTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spanCoverage: shared 60-char prefix is flagged, short docs score 0") {
    import spark.implicits._
    val prefix = "a" * 25 + "b" * 35                 // 60 chars
    val suffix = "z" * 40
    val unique = ('a' to 'z').mkString * 3           // 78 chars, no aa/bb runs
    val docs = Seq(
      (1L, prefix),                                  // len 60: 3 grams, all shared
      (2L, prefix + suffix),                         // len 100: 7 grams, 3 shared
      (3L, unique),                                  // no cross-doc grams
      (4L, "tiny"))                                  // len < window: 0 grams
      .toDF("doc_id", "text")
    val out = Dedup.spanCoverageOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((7L, 3L, 3.0 / 7.0)))
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("q38RollingDistinct matches a sequential 7-day recount") {
    val got = Relational.q38RollingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    // Brute force: per order day, distinct customers over [d-6, d].
    val pairs = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toSet
    val days = pairs.map(_._1)
    val expect = days.map { d =>
      d -> pairs.filter { case (pd, _) =>
        !pd.isAfter(d) && pd.isAfter(d.minusDays(7)) }.map(_._2).size.toLong
    }.toMap
    assert(got.keySet == days)
    assert(got == expect)
  }

  test("dqBenford matches sequential digit counts and Benford is normalized") {
    val got = DataQuality.dqBenford(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val prices = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    val digits = prices.map(p =>
      (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
        .bigDecimal.longValueExact.toString.head.asDigit)
      .filter(d => d >= 1 && d <= 9)
    val expectN = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == expectN)
    // Benford expectations sum to ~1 and decrease monotonically.
    val bf = (1 to 9).map(d => got(d)._3)
    assert(math.abs(bf.sum - 1.0) < 1e-4)
    assert(bf.zip(bf.tail).forall { case (a, b) => a > b })
  }

  test("tokenBudget reproduces the sequential greedy cut") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (id, t) =>
      (id, t.split(" ", -1).length.toLong,
        t.toLowerCase.split(" ", -1).distinct.length.toLong)
    }
    val budget = scored.map(_._2).sum * 3 / 10
    var cum = 0L
    val keep = scored.sortBy { case (id, _, u) => (-u, id) }
      .takeWhile { case (_, tok, _) => { cum += tok; cum <= budget } }
      .map(_._1).toSet
    val got = CurationPipeline.tokenBudget(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == keep)
    assert(got.map(_.getLong(3)).max <= budget)
  }

  test("bfsDistances: path distances, min-merge across seeds, unreachable dropped") {
    import spark.implicits._
    // Path 1-2-3-4-5 plus isolated 9; seeds at both 1 and 5.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 5L).toDF("id")
    val out = Graph.bfsDistances(nodes, edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("charEntropy matches a sequential snapped computation") {
    val doc = Tables.documents(spark, sf)
      .orderBy(col("doc_id")).select(col("doc_id"), col("text")).head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val n = text.codePointCount(0, text.length)
    val counts = text.codePoints().toArray.toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val sum9 = counts.values.map(c =>
      math.floor(c * math.log(n.toDouble / c) * 1e9 + 0.5).toLong).sum
    val expect = sum9.toDouble / (n * 1e9)
    val got = TextAnalysis.charEntropy(spark, sf)
      .filter(col("doc_id") === id).head()
    assert(got.getLong(1) == n.toLong)
    assert(got.getLong(2) == counts.size.toLong)
    assert(got.getDouble(3) == expect)
  }

  test("curriculum: contiguous global positions matching the sequential sort") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = rows.groupBy(_._2)
    val keyed = bySource.toSeq.flatMap { case (src, ds) =>
      val sorted = ds.map(_._1).sorted
      sorted.zipWithIndex.map { case (id, i) =>
        (id, src, (2.0 * (i + 1) - 1) / (2.0 * sorted.length))
      }
    }
    val expect = keyed.sortBy { case (id, src, k) => (k, src, id) }
      .map(_._1)
    val got = TrainingData.curriculum(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    assert(got.map(_.getLong(1)).toSeq == expect.toSeq)
    // Interleave property: in any window of 50 consecutive positions,
    // no single source occupies more than 60% once sources mix evenly.
    val srcSeq = got.map(_.getString(2))
    val windows = srcSeq.sliding(50).toSeq
    val share = bySource.view.mapValues(_.size.toDouble / rows.length)
    windows.foreach { w =>
      w.groupBy(identity).foreach { case (s, hits) =>
        assert(hits.length <= 50 * share(s) + 8,
          s"source $s clumped: ${hits.length} of 50")
      }
    }
  }

  test("randomProjection matches a sequential signed fold, snapped") {
    val first = Tables.embeddings(spark, sf)
      .orderBy(col("vec_id")).select(col("vec_id"), col("embedding"))
      .head()
    val vid = first.getLong(0)
    val emb = first.getSeq[Float](1).map(_.toDouble)
    def signOf(i: Int, j: Int): Double =
      if (((i.toLong * 1000003L + j * 7919L) % 97) % 2 == 0) 1.0 else -1.0
    val expect = (0 until 8).map { j =>
      val s = emb.zipWithIndex
        .foldLeft(0.0) { case (acc, (x, i)) => acc + signOf(i, j) * x }
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    val got = Similarity.randomProjection(spark, sf)
      .filter(col("vec_id") === vid).head()
    (0 until 8).foreach { j =>
      assert(got.getDouble(j + 1) == expect(j),
        s"dim $j: ${got.getDouble(j + 1)} != ${expect(j)}")
    }
  }
}
