package graft

import org.apache.spark.sql.functions._

/** Round-9 growth batch two: RAG chunk windows, post-dedup mixture
  * drift, context-window truncation-loss curve. */
class RoundNineBatchTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunk windows: spans tile each doc with stride overlap, tail " +
      "kept, short docs are one whole-doc chunk") {
    val (w, stride) = (32, 24)
    val rows = graft.ops.TextAnalysis.chunkWindows(spark, sf, w, stride)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      val n = nTok(doc)
      // first chunk starts at token 1; consecutive starts differ by
      // the stride; the last chunk's end is the doc end (tail kept)
      assert(sorted.head.getLong(2) == 1L, sorted.head.toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) == stride, s"$a $b")
        case _ =>
      }
      assert(sorted.last.getLong(3) == n, s"doc=$doc n=$n")
      if (n <= w)
        assert(sorted.length == 1 && sorted.head.getLong(3) == n)
      sorted.foreach { c =>
        assert(c.getLong(3) - c.getLong(2) + 1 <= w, c.toString)
      }
    }
    // every tokenized doc is chunked
    assert(byDoc.keySet == nTok.filter(_._2 > 0).keySet)
  }

  test("mixture drift: shares sum to ~1e6 on both sides, drift sums " +
      "to ~0, duplicate-free corpora drift nowhere") {
    val rows = graft.ops.Dedup.mixtureDrift(spark, sf).collect()
    val before = rows.map(_.getLong(3)).sum
    val after = rows.map(_.getLong(4)).sum
    // div flooring loses at most one ppm per source
    assert(math.abs(before - 1000000L) <= rows.length, before.toString)
    assert(math.abs(after - 1000000L) <= rows.length, after.toString)
    assert(math.abs(rows.map(_.getLong(5)).sum) <= 2L * rows.length)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), r.toString))
  }

  test("context overflow: monotone in window size, loss matches a " +
      "direct computation") {
    val rows = graft.ops.TrainingData.contextOverflow(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).sameElements(Array(16L, 32L, 64L)))
    // larger windows overflow less and lose less
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) >= b.getLong(2), s"$a $b")
        assert(a.getLong(4) >= b.getLong(4), s"$a $b")
      case _ =>
    }
    val n = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokenCount(col("text")))
      .collect().map(_.getLong(0))
    rows.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(4) == n.map(x => math.max(x - l, 0L)).sum,
        r.toString)
    }
  }

  test("plans: all three are join-free except mixture drift's " +
      "survivor re-join; no SMJ, no cartesian") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val chunk = plan(graft.ops.TextAnalysis.chunkWindows(spark, sf))
    assert(!chunk.contains("Join"), chunk)
    val over = plan(graft.ops.TrainingData.contextOverflow(spark, sf))
    assert(!over.contains("Join"), over)
    val drift = plan(graft.ops.Dedup.mixtureDrift(spark, sf))
    assert(!drift.contains("SortMergeJoin"), drift)
    assert(!drift.contains("CartesianProduct"), drift)
  }
}
