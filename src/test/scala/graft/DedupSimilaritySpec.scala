package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.ops.{Dedup, DocCorpus, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simhash: small hamming for near-identical, large for unrelated") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"tok$i").mkString(" ") // drop 1 token
    val unrelated = (1 to 60).map(i => s"other$i word$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("id", "text")
      .select($"id", simhash64($"text").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) <= 8)          // near-dup: few bits flip
    assert(ham(m(1L), m(3L)) >= 16)         // unrelated: many bits differ
  }

  test("minhash LSH finds every whitespace/case and drop-last-token dup") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (orig, +10000) exact-dup pair must be recalled
    val wsPairs = (0L until 100L).map(i => (i, i + 10000)).toSet
    assert(wsPairs.subsetOf(pairs), s"missing ${wsPairs.diff(pairs).size} ws pairs")
    // drop-last-token near-dups have jaccard≈(n-3)/n ≈ 0.93+ → recalled
    val dropPairs = (0L until 100L).map(i => (i, i + 20000)).toSet
    assert(dropPairs.subsetOf(pairs),
      s"missing ${dropPairs.diff(pairs).size} drop-token pairs")
  }

  test("incremental near-dup equals brute-force batch-vs-corpus truth") {
    val all = DocCorpus.withDuplicates(spark, dir)
    val corpus = all.filter(col("doc_id") < 10000)
    val batch = all.filter(col("doc_id") >= 10000)
    val got = Dedup.incrementalNearDupPairs(corpus, batch)
      .select("new_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute force: every (batch, corpus) pair with shingle-set
    // jaccard >= 0.6 — at the mutants' similarity (~0.93+) the LSH
    // band recall is ~1, so the candidate path must find them all.
    val h = all.select(col("doc_id"),
      shingleHashes(lower(col("text")), 3).as("hs"))
    val want = h.toDF("new_id", "h_a").filter(col("new_id") >= 10000)
      .crossJoin(h.toDF("dup_of", "h_b").filter(col("dup_of") < 10000))
      .withColumn("j",
        size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
        size(array_union(col("h_a"), col("h_b"))).cast("double"))
      .filter(col("j") >= 0.6)
      .select("new_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(got),
      s"LSH incremental missed ${want.diff(got).size} true pairs")
    assert(got.subsetOf(want),
      s"verification let ${got.diff(want).size} sub-threshold pairs through")
  }

  test("incremental exact pairs: every normalized dup, nothing else") {
    val out = Dedup.incremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // All 100 whitespace/case mutants must pair with their original...
    val wsPairs = (0L until 100L).map(i => (i + 10000, i)).toSet
    assert(wsPairs.subsetOf(out))
    // ...and every reported pair is a true normalized-text match
    // (the tiny vocabulary makes some drop-last mutants collide with
    // OTHER corpus docs — those are genuine duplicates, not noise).
    val all = DocCorpus.withDuplicates(spark, dir)
    val norm = all.select(col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("n"))
    val want = norm.toDF("new_id", "n").filter(col("new_id") >= 10000)
      .join(norm.toDF("dup_of", "n"), "n")
      .filter(col("dup_of") < 10000)
      .select("new_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == want)
  }

  test("winnowing: local edit perturbs only trailing fingerprints") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val casedDoubleSpace = base.toUpperCase.replace(" ", "  ")
    // change every 10th token: several separated edit regions — the
    // sets must differ, but unedited stretches keep shared prints
    val edited = (1 to 40)
      .map(i => if (i % 10 == 0) s"edit$i" else s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, casedDoubleSpace), (3L, edited))
      .toDF("id", "text")
      .select($"id", winnowFingerprints($"text").as("fp"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(m(1L) == m(2L)) // normalization-equivalent → identical set
    val overlap = (m(1L) intersect m(3L)).size.toDouble / (m(1L) union m(3L)).size
    assert(overlap >= 0.15 && m(1L) != m(3L),
      s"spread edits should keep partial overlap, got $overlap")
    // winnowing samples: far fewer fingerprints than windows
    assert(m(1L).size < 38 && m(1L).size >= 38 * 2 / (4 + 1) / 2)
    // the windowed DataFrame formulation produces identical sets
    val short = "only two tok" // n_windows <= w degenerate case
    val dfSets = winnowDf(
      Seq((1L, base), (2L, casedDoubleSpace), (3L, edited), (4L, short))
        .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(dfSets.view.filterKeys(_ <= 3).toMap == m)
    val scalarShort = Seq((4L, short)).toDF("id", "text")
      .select(winnowFingerprints($"text")).collect()(0).getSeq[Long](0).toSet
    assert(dfSets(4L) == scalarShort)
  }

  test("minhash signature: identical text → identical signature") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "a completely different sentence here"))
      .toDF("id", "text")
      .select($"id", minhashSignature($"text", k = 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("ann LSH: recalls the high-margin nearest neighbor set") {
    val bf = Similarity.topK(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: must overlap the exact top-5 meaningfully
    val recall = (ann intersect bf).size.toDouble / bf.size
    assert(recall >= 0.2, s"ann recall@5 too low: $recall")
    // and every ann hit must be a real vector pair (sanity)
    assert(ann.forall { case (q, t) => q < 5 && t >= 0 && q != t })
  }

  test("ann IVF: probed cells recall the exact top-5 meaningfully") {
    val bf = Similarity.topK(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, dir).select("query_id", "target_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    // nProbe=4 of 16 cells covers a quarter of the space; high-sim
    // neighbors concentrate in the query's own cell, so recall should
    // beat the random-probe floor comfortably
    assert(recall >= 0.2, s"ivf recall@5 too low: $recall")
    assert(ivf.forall { case (q, t) => q < 5 && t >= 0 && q != t })
    // rank column is a contiguous 1..k per query
    val ranks = Similarity.annIvf(spark, dir)
      .groupBy("query_id").agg(collect_list("rank").as("rs"))
      .collect().map(_.getSeq[Long](1).sorted)
    assert(ranks.forall(rs => rs == (1L to rs.length).toVector))
  }

  test("components: each mutant group collapses to its original's id") {
    val comp = Dedup.components(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every original 0..99 labels its own cluster; both mutants join it
    (0L until 100L).foreach { i =>
      assert(comp(i) == comp(i + 10000) && comp(i) == comp(i + 20000))
      assert(comp(i) <= i)
    }
  }

  test("star contraction: log-bounded rounds on a deep chain, labels " +
      "match propagation") {
    import spark.implicits._
    // one 64-deep chain + one 3-cycle + two isolated nodes
    val nodes = ((0L to 63L) ++ Seq(100L, 101L, 102L, 200L, 201L))
      .toDF("id")
    val pairs = ((0L until 63L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L)))
      .toDF("id_a", "id_b")
    val (labels, rounds) =
      Dedup.componentsByStarContraction(nodes, pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 63L).foreach(i => assert(got(i) == 0L, s"node $i"))
    Seq(100L, 101L, 102L).foreach(i => assert(got(i) == 100L))
    assert(got(200L) == 200L && got(201L) == 201L)
    // diameter 63; contraction must be far under it (log-ish).
    // (min-label propagation would need 63 rounds here — past its
    // iteration cap; that is exactly the case this variant exists for)
    assert(rounds < 16, s"took $rounds rounds on a 63-diameter chain")
  }

  test("exact dedup: survivors count matches corpus minus dup groups") {
    val survivors = Dedup.exact(spark, dir)
    val corpus = DocCorpus.withDuplicates(spark, dir)
    // every group's survivor is its minimum doc_id and sizes sum to corpus
    assert(survivors.agg(sum("n_dups")).collect()(0).getLong(0) ==
      corpus.count())
    assert(survivors.filter(col("n_dups") >= 2).count() >= 100)
  }

  test("keep-best survivors: one per component, member counts add up") {
    val out = Dedup.keepBest(spark, dir).collect()
    // components are keyed by their min doc_id; survivors are unique
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // members across clusters = bounded corpus size (100 originals
    // + 100 ws/case mutants + 100 drop-last mutants)
    assert(out.map(_.getLong(2)).sum == 300L)
    // a multi-member cluster's survivor must not be forced to min id:
    // quality decides (drop-last mutants are shorter => usually lower
    // length score). At minimum, every survivor belongs to [0, 30100).
    assert(out.forall(r => r.getLong(1) >= 0))
  }

  test("int8 quantization: codes bounded, zero vector safe, error small") {
    import spark.implicits._
    import org.apache.spark.sql.types.DoubleType
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25)),
      (2L, Seq(0.0, 0.0, 0.0)), // all-zero: scale floor keeps q = 0
      (3L, Seq(1e-8, -1e-8, 0.0)))
      .toDF("vec_id", "v")
      .select($"vec_id", transform($"v", _.cast(DoubleType)).as("v"))
    val q = Similarity.quantizeInt8(df)
      .select($"vec_id", $"q", $"scale").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Int](1), r.getDouble(2))).toMap
    assert(q(1L)._1 == Seq(64, -127, 32)) // 0.5/1.0*127+0.5 floor = 64
    assert(q(2L)._1 == Seq(0, 0, 0))
    assert(q(3L)._1.forall(c => c.abs <= 127))
    // dequant error bounded by scale/254 (half a code step)
    val err = Similarity.quantizeInt8(df)
      .select(aggregate(
        zip_with($"q", $"v", (qi, xi) =>
          abs(qi * $"scale" / 127.0 - xi)),
        lit(0.0), (a, x) => greatest(a, x)).as("e"))
      .agg(max($"e")).collect()(0).getDouble(0)
    assert(err <= 1.0 / 254.0 + 1e-12)
  }

  test("persisted IVF index: pruned probe, deterministic, well-formed") {
    val sf = "/root/testdata/sf0.001"
    val indexDir = tmpDir("ann_index")
    Similarity.annIvfBuildIndex(spark, sf, indexDir)
    // the lists really are laid out as one directory per cell
    val cellDirs = new java.io.File(s"$indexDir/lists")
      .listFiles().filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length > 1, cellDirs.mkString(","))
    val probe = Similarity.annIvfProbeIndex(spark, sf, indexDir)
    // probing a FIXED index is fully deterministic
    val r1 = probe.collect().toSeq
    val r2 = Similarity.annIvfProbeIndex(spark, sf, indexDir).collect().toSeq
    assert(r1 == r2)
    // well-formed: ≤ k per query, descending sim, no self-pairs
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.size <= 5))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    assert(r1.forall(r => r.getLong(0) != r.getLong(1)))
    // the list scan is partition-pruned to the probed cells
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell"))
    assert(scanLine.isDefined, plan)
  }

  test("prefix-filtered jaccard join equals brute force on the full corpus") {
    val corpus = DocCorpus.withDuplicates(spark, dir)
    val prefix = Dedup.jaccardPrefixPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Brute-force truth over the same shingle sets — quadratic, but the
    // sf0.001 corpus is ~90 docs.
    val sets = corpus.select(col("doc_id"),
      array_distinct(shingles(lower(col("text")), 3)).as("sh"))
    val a = sets.toDF("id_a", "sh_a")
    val b = sets.toDF("id_b", "sh_b")
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    // EXACT equality — prefix filtering is lossless, not probabilistic.
    assert(prefix == brute,
      s"missing=${brute.diff(prefix).take(5)} extra=${prefix.diff(brute).take(5)}")
  }

  test("binary quantization: bits match signs, codes non-negative, self-distance zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.tabulate(64)(d => if (d % 3 == 0) 0.5 else -0.5)),
      (2L, Array.fill(64)(-1.0)),           // all-negative → code 0
      (3L, Array.fill(64)(2.0))             // all-positive → all 32 bits
    ).toDF("vec_id", "v")
    val out = graft.ops.Similarity.bqCodes(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expLo = (0 until 32).filter(_ % 3 == 0).map(1L << _).sum
    val expHi = (32 until 64).filter(_ % 3 == 0).map(d => 1L << (d - 32)).sum
    assert(out(1L) == ((expLo, expHi)))
    assert(out(2L) == ((0L, 0L)))
    assert(out(3L) == (((1L << 32) - 1, (1L << 32) - 1)))
    assert(out.values.forall { case (lo, hi) => lo >= 0 && hi >= 0 })
    // Hamming(x, x) = 0 via the same xor/bit_count expression
    assert(java.lang.Long.bitCount(expLo ^ expLo) == 0)
  }

  test("sim_ivf_pq: composed probe emits contiguous valid ranks and " +
      "clears its recall floor") {
    val rows = Similarity.ivfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, t, _) =>
      assert(q < 5 && q != t, s"invalid pair ($q,$t)")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq,
        s"ranks not contiguous for query $q")
    }
    val gate = Similarity.ivfPqRecall(spark, dir).collect()(0)
    assert(gate.getBoolean(1) && gate.getBoolean(2))
  }
}
