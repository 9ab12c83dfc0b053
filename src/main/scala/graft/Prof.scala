package graft

import org.apache.spark.sql.functions.col

/** Dev-only micro-profiler for hotspot queries: runs each target
  * twice (cold incl. analysis+codegen, then warm) to separate
  * fixed per-query overhead from per-row compute. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      // A hash(k1) exchange may serve a (k1, k2) join (subset-key
      // co-partitioning — Spark made the conservative choice the
      // default in 3.4); the engine's shared-exchange plans rely on it.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time2(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[prof] $name%-28s cold $cold%7.2fs  warm $warm%7.2fs")
    }
    val d1 = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time2("dedup_exact") { noop(ops.Dedup.exact(spark, d1)) }
    time2("corpus_only") { noop(ops.DocCorpus.withDuplicates(spark, d1)) }
    time2("fingerprint_only") {
      noop(ops.DocCorpus.withDuplicates(spark, d1)
        .select(functions.TextFunctions.fingerprint(col("text")).as("fp")))
    }
    time2("shingle_sets") {
      noop(ops.DocCorpus.withDuplicates(spark, d1)
        .filter(col("doc_id") % 10000 < 100)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.array_distinct(
            functions.TextFunctions.shingles(
              org.apache.spark.sql.functions.lower(col("text")), 3)).as("sh")))
    }
    time2("minhash_sig_only") {
      noop(ops.DocCorpus.withDuplicates(spark, d1)
        .select(col("doc_id"),
          functions.TextFunctions.minhashSignature(col("text")).as("sig")))
    }
    time2("dedup_ngram_jaccard") { noop(ops.Dedup.ngramJaccard(spark, d1)) }
    time2("dedup_minhash_lsh") { noop(ops.Dedup.minhashLsh(spark, d1)) }
    time2("baskets_only") {
      noop(graft.Tables.lineitem(spark, d1)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_set(
            col("l_partkey"))).as("ps")))
    }
    time2("pairs_only") {
      val b = graft.Tables.lineitem(spark, d1)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_set(
            col("l_partkey"))).as("ps"))
      noop(b.filter(org.apache.spark.sql.functions.size(col("ps")) >= 2)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr(
            "flatten(transform(ps, (x, i) -> transform(" +
            "slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"))
          .as("p"))
        .select(col("p.pa"), col("p.pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_pair")))
    }
    time2("mine_copurchase") { noop(ops.Mining.copurchaseGate(spark, d1)) }
    spark.stop()
  }
}
