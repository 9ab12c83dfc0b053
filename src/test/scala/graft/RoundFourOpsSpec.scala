package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Linkage, TextAnalysis, TimeSeries}

/** Unit fixtures for the round-4 additions whose gates run on corpus
  * data: hand-computable graphs / corpora where the expected output
  * is known in closed form. */
class RoundFourOpsSpec extends SparkSpec {

  test("triangleCounts: K4 has 4 triangles, 3 per node; paths have none") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus a dangling path 4-5-6 (no triangle).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: each vertex participates in C(3,2) = 3 triangles.
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(!out.contains(5L) && !out.contains(6L))
  }

  test("triangleCounts: star graph (celebrity hub) closes nothing") {
    import spark.implicits._
    val edges = (2L to 40L).map(i => (1L, i)).toDF("id_a", "id_b")
    assert(Graph.triangleCounts(edges).count() == 0)
  }

  test("invertedIndex: postings ranked by tf desc, doc_id tiebreak, capped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana"),
      (2L, "apple apple cherry"),
      (3L, "apple banana banana"),
      (4L, "Apple cherry cherry cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, topN = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // apple: df 4 (case-folded), total 3+2+1+1 = 7, top-2 = doc1(3), doc2(2)
    assert(out("apple") == ((4L, 7L, "1:3|2:2")))
    // banana: doc3 has 2, doc1 has 1
    assert(out("banana") == ((2L, 3L, "3:2|1:1")))
    // cherry: doc4 has 3, doc2 has 1
    assert(out("cherry") == ((2L, 4L, "4:3|2:1")))
  }

  test("rollingFeatures: trailing frame never sees future rows") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.0),
      (1L, 11L, "2024-01-01 00:01:00", 2.0),
      (1L, 12L, "2024-01-01 00:02:00", 4.0),
      (2L, 20L, "2024-01-01 00:00:00", 9.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = TimeSeries.rollingFeatures(ev, k = 2).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(out(10L) == ((1L, 1.0, 1.0, 1.0)))
    assert(out(11L) == ((2L, 3.0, 1.0, 2.0)))
    assert(out(12L) == ((2L, 6.0, 2.0, 4.0))) // frame = rows 11,12 only
    assert(out(20L) == ((1L, 9.0, 9.0, 9.0))) // other user isolated
  }

  test("blockedLink: omission blocking equals brute force, never cross-joins") {
    import spark.implicits._
    // 8-char ids; edits confined to the last 2 chars → omit (7,1), (8,1).
    val clean = Seq((1L, "AAAAAA01"), (2L, "AAAAAA02"), (3L, "AAAAAA13"),
      (4L, "AAAAAA99")).toDF("id", "name")
    val dirty = Seq((101L, "AAAAAA03"), (102L, "AAAAAA12"),
      (103L, "AAAAAA99"), (104L, "BBBBBB01")).toDF("id", "name")
    val out = Linkage.blockedLink(dirty, clean,
        omit = Seq((7, 1), (8, 1)), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = dirty.toDF("did", "dname").crossJoin(clean.toDF("cid", "cname"))
      .withColumn("lev", levenshtein(col("dname"), col("cname")).cast("long"))
      .filter(col("lev") <= 1)
      .select("did", "cid", "lev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brute)
    assert(out.contains((101L, 1L, 1L)) && out.contains((101L, 2L, 1L)))
    assert(out.contains((103L, 4L, 0L)))           // exact survives
    assert(!out.exists(_._1 == 104L))              // far record: no match
  }

  test("LM scoring invariants: bigram lp < 0, DSIR excludes target, OOV bounded") {
    val sf = "/root/testdata/sf0.001"
    val lm = ops.LanguageModel.bigramLm(spark, sf)
    assert(lm.filter(col("lp_mean") >= 0).count() == 0,
      "smoothed log-probs are strictly negative")
    val dsir = ops.LanguageModel.dsirWeights(spark, sf)
    assert(dsir.filter(col("doc_id") % 101 === 0).count() == 0,
      "target slice must never score itself")
    assert(dsir.count() > 0)
    val oov = ops.LanguageModel.oovRate(spark, sf)
    assert(oov.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    // A tiny vocab must produce a strictly higher mean OOV rate than a
    // huge one (monotone coverage).
    val small = ops.LanguageModel.oovRate(spark, sf, n = 10)
      .agg(avg("oov_rate")).head.getDouble(0)
    val large = ops.LanguageModel.oovRate(spark, sf, n = 100000)
      .agg(avg("oov_rate")).head.getDouble(0)
    assert(small > large)
  }
}
