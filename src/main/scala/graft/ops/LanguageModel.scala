package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Statistical-language-model scoring operators — the curation steps a
  * pre-training pipeline runs to rank raw text by model-fit before
  * spending GPU time on it:
  *
  *   - [[bigramLm]]: add-one-smoothed bigram log-likelihood per
  *     document (the deterministic stand-in for perplexity filtering —
  *     a real LM scorer slots into the same plan shape);
  *   - [[dsirWeights]]: DSIR-style importance weights
  *     (log target-LM / raw-LM unigram ratio, per document) for
  *     importance resampling toward a held-out target distribution;
  *   - [[oovRate]]: out-of-vocabulary fraction against the corpus's
  *     own top-N vocabulary, a cheap tokenizer-coverage screen.
  *
  * Determinism policy (shared with `TextAnalysis.unigramSurprisal`):
  * every per-token log term is snapped to a 1e-6-scaled LONG before
  * any aggregation — long sums commute, double sums don't — so the
  * scores are independent of row order and bit-identical in DuckDB.
  *
  * All token/gram arithmetic is plain single-space `split`, mirrored
  * exactly by `string_split` in the oracles.
  */
object LanguageModel {

  private def words(text: Column): Column = split(lower(text), " ")

  /** 1e-6-snapped natural log of a double expression. */
  private def snap(x: Column): Column =
    floor(x * 1000000.0 + 0.5).cast(LongType)

  /** Per-document mean add-one-smoothed bigram log-probability under
    * the corpus's own bigram model:
    * `mean(ln((c(w1,w2)+1) / (c(w1)+V)))` over the document's bigrams.
    *
    * Scale: the two count tables are O(distinct bigrams) and
    * O(vocabulary). The vocabulary (+V scalar) side is broadcast; the
    * bigram-count side joins on the gram key — the same key the counts
    * were grouped by, so with AQE the exchange is reused, and the
    * per-doc reduce is the only other shuffle. Nothing is quadratic
    * and nothing collects to the driver.
    */
  def bigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      explode(words(col("text"))).as("w"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = docs.select(col("doc_id"),
        explode(graft.plans.TextExpressions.tokenNGrams(
          { graft.plans.TextExpressions.register(s); words(col("text")) },
          2, emitWholeShortDoc = false)).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    val bgc = big.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    big.join(bgc, "bg")
      .join(broadcast(uni), col("w1") === uni("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", snap(log((col("c2") + lit(1)).cast(DoubleType) /
        (col("c1") + col("v")).cast(DoubleType))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")).cast(DoubleType) /
          (count(lit(1)) * 1000000.0)).as("lp_mean"))
      .orderBy(col("doc_id"))
  }

  val bigramLmSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |toks AS (SELECT doc_id, unnest(t) AS w FROM tok),
      |uni AS (SELECT w, COUNT(*) AS c1 FROM toks GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM uni),
      |pos AS (SELECT doc_id, t,
      |          unnest(range(1, greatest(len(t), 1))) AS i FROM tok),
      |big AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg,
      |               t[i] AS w1 FROM pos),
      |bgc AS (SELECT bg, COUNT(*) AS c2 FROM big GROUP BY bg),
      |scored AS (
      |  SELECT big.doc_id,
      |    CAST(floor(ln(CAST(bgc.c2 + 1 AS DOUBLE) /
      |      CAST(uni.c1 + vocab.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS lp
      |  FROM big JOIN bgc USING (bg) JOIN uni ON big.w1 = uni.w
      |  CROSS JOIN vocab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(lp) AS DOUBLE) / (COUNT(*) * 1000000.0) AS lp_mean
      |FROM scored GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023): score every
    * raw document by `mean(ln P_target(w) − ln P_raw(w))` over its
    * tokens, under add-one-smoothed unigram models of the held-out
    * target slice (`doc_id % 101 == 0`, the same stand-in the
    * decontamination gates use) and of the raw corpus. Documents that
    * look most like the target float to the top for resampling.
    *
    * Scale: both models are O(vocabulary) count tables over the SAME
    * term key — they join each other and then the token stream on that
    * one key; the combined weight table is vocabulary-sized and
    * broadcast, so the raw corpus never shuffles except for its per-doc
    * reduce. The totals are scalar cross joins.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
    val isTarget = col("doc_id") % 101 === 0
    val ct = toks.filter(isTarget).groupBy(col("w"))
      .agg(count(lit(1)).as("ct"))
    val cr = toks.filter(!isTarget).groupBy(col("w"))
      .agg(count(lit(1)).as("cr"))
    val totals = toks.agg(
      count(lit(1)).as("n_all"),
      sum(when(isTarget, 1L).otherwise(0L)).as("nt"),
      sum(when(isTarget, 0L).otherwise(1L)).as("nr"),
      countDistinct(col("w")).as("v"))
    val weights = toks.select(col("w")).distinct()
      .join(ct, Seq("w"), "left").join(cr, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("w"), snap(
        log((coalesce(col("ct"), lit(0L)) + lit(1)).cast(DoubleType) /
          (col("nt") + col("v")).cast(DoubleType)) -
        log((coalesce(col("cr"), lit(0L)) + lit(1)).cast(DoubleType) /
          (col("nr") + col("v")).cast(DoubleType))).as("lw"))
    toks.filter(!isTarget)
      .join(broadcast(weights), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        (sum(col("lw")).cast(DoubleType) /
          (count(lit(1)) * 1000000.0)).as("dsir_weight"))
      .orderBy(col("doc_id"))
  }

  val dsirWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |ct AS (SELECT w, COUNT(*) AS ct FROM toks
      |       WHERE doc_id % 101 = 0 GROUP BY w),
      |cr AS (SELECT w, COUNT(*) AS cr FROM toks
      |       WHERE doc_id % 101 <> 0 GROUP BY w),
      |totals AS (SELECT
      |    SUM(CASE WHEN doc_id % 101 = 0 THEN 1 ELSE 0 END) AS nt,
      |    SUM(CASE WHEN doc_id % 101 <> 0 THEN 1 ELSE 0 END) AS nr,
      |    COUNT(DISTINCT w) AS v
      |  FROM toks),
      |weights AS (
      |  SELECT w, CAST(floor((
      |      ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) /
      |         CAST(totals.nt + totals.v AS DOUBLE)) -
      |      ln(CAST(COALESCE(cr.cr, 0) + 1 AS DOUBLE) /
      |         CAST(totals.nr + totals.v AS DOUBLE))
      |    ) * 1000000.0 + 0.5) AS BIGINT) AS lw
      |  FROM (SELECT DISTINCT w FROM toks) vw
      |  LEFT JOIN ct USING (w) LEFT JOIN cr USING (w)
      |  CROSS JOIN totals)
      |SELECT doc_id, COUNT(*) AS n_tok,
      |  CAST(SUM(lw) AS DOUBLE) / (COUNT(*) * 1000000.0) AS dsir_weight
      |FROM toks JOIN weights USING (w)
      |WHERE doc_id % 101 <> 0
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Out-of-vocabulary rate against the corpus's own top-`n` terms
    * (count desc, term asc for a total order): per document, the
    * fraction of tokens outside the vocabulary. The tokenizer-coverage
    * screen that flags documents a fixed vocab would shred into
    * unknowns.
    *
    * Scale: the vocabulary is a bounded global top-`n` (rank over the
    * term-count table, already tiny after its map-side-combined
    * groupBy), broadcast to a left join; one per-doc reduce. The
    * integer hit-count division is exact IEEE on both engines.
    */
  def oovRate(s: SparkSession, dir: String, n: Int = 1000): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(n)
      .select(col("w"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  val oovRateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |vocab AS (
      |  SELECT w FROM (
      |    SELECT w, COUNT(*) AS c FROM toks GROUP BY w
      |    ORDER BY c DESC, w LIMIT 1000)),
      |agg AS (
      |  SELECT t.doc_id, COUNT(*) AS n_tok,
      |    SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      |  FROM toks t LEFT JOIN vocab v ON t.w = v.w
      |  GROUP BY t.doc_id)
      |SELECT doc_id, n_tok, CAST(n_oov AS BIGINT) AS n_oov,
      |  CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE) AS oov_rate
      |FROM agg ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bigram_lm" -> (bigramLm _),
    "curate_dsir" -> (dsirWeights _),
    "text_oov_rate" -> ((s, d) => oovRate(s, d)))

  def oracle: Map[String, String] = Map(
    "text_bigram_lm" -> bigramLmSql,
    "curate_dsir" -> dsirWeightsSql,
    "text_oov_rate" -> oovRateSql)
}
