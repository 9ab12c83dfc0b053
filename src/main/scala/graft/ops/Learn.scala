package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** In-engine model training steps: batch gradient descent for a
  * logistic-regression quality classifier, run AS aggregations —
  * the "train the filter where the data lives" pattern (the curation
  * practice behind fastText-style quality filters, here on the
  * engine's own operators instead of an export→sklearn hop).
  *
  * Scale: one full-batch GD step is ONE map-combinable aggregation
  * over the corpus (k gradient accumulators), and the weight vector
  * between steps is a broadcast single row — the classic distributed
  * full-batch GD shape. Nothing is collected to the driver.
  *
  * Determinism: per-row gradient terms snap to 1e9-scaled longs
  * before the commutative sum; each weight update is one integer→
  * double division. The step-2 sigmoid is the only transcendental,
  * rounded to 6 dp on both engines (the repo's established
  * `round(x, 6)` parity idiom for libm results).
  */
object Learn {

  private val Eta = 1.0 // learning rate

  /** Two full-batch GD steps from w=0 for P(lang='en' | features),
    * features x0=1 (intercept), x1=n_chars/1000, x2=space ratio.
    * Output: one row per step with the post-step weights. Step 1 from
    * w=0 has σ=0.5 exactly (no transcendental at all); step 2 uses
    * the 6dp-rounded sigmoid at w1.
    */
  def logregSteps(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(s, dir).select(
      lit(1.0).as("x0"),
      (col("n_chars").cast(DoubleType) / lit(1000.0)).as("x1"),
      ((length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))) /
        col("n_chars").cast(DoubleType)).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    def grad9(xj: Column, p: Column): Column =
      sum(floor(xj * (p - col("y")) * 1e9 + 0.5).cast(LongType))
    // Step 1: w = 0 ⇒ p = 0.5 exactly.
    val g1 = feats.agg(
      grad9(col("x0"), lit(0.5)).as("g0"),
      grad9(col("x1"), lit(0.5)).as("g1"),
      grad9(col("x2"), lit(0.5)).as("g2"),
      count(lit(1)).as("n"))
    def upd(g: Column, n: Column): Column =
      g.cast(DoubleType) / (n.cast(DoubleType) * 1e9)
    val w1 = g1.select(
      (-upd(col("g0"), col("n"))).as("b0"),
      (-upd(col("g1"), col("n"))).as("b1"),
      (-upd(col("g2"), col("n"))).as("b2"))
    // Step 2: margin in fixed syntactic order, sigmoid rounded 6 dp.
    val withP = feats.crossJoin(broadcast(w1))
      .withColumn("m",
        col("b0") * col("x0") + col("b1") * col("x1") +
          col("b2") * col("x2"))
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("m"))), 6))
    val g2 = withP.agg(
      grad9(col("x0"), col("p")).as("g0"),
      grad9(col("x1"), col("p")).as("g1"),
      grad9(col("x2"), col("p")).as("g2"),
      count(lit(1)).as("n"),
      min(col("b0")).as("b0"), min(col("b1")).as("b1"),
      min(col("b2")).as("b2"))
    val w2 = g2.select(
      (col("b0") - upd(col("g0"), col("n"))).as("b0"),
      (col("b1") - upd(col("g1"), col("n"))).as("b1"),
      (col("b2") - upd(col("g2"), col("n"))).as("b2"))
    w1.select(lit(1L).as("step"), col("b0"), col("b1"), col("b2"))
      .union(w2.select(lit(2L).as("step"), col("b0"), col("b1"),
        col("b2")))
      .orderBy(col("step"))
  }

  val logregSql: String =
    """WITH feats AS (
      |  SELECT CAST(1 AS DOUBLE) AS x0,
      |    CAST(n_chars AS DOUBLE) / 1000 AS x1,
      |    (length(text) - length(replace(text, ' ', '')))
      |      / CAST(n_chars AS DOUBLE) AS x2,
      |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
      |         ELSE CAST(0 AS DOUBLE) END AS y
      |  FROM documents),
      |g1 AS (
      |  SELECT
      |    CAST(SUM(CAST(floor(x0 * (0.5 - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g0,
      |    CAST(SUM(CAST(floor(x1 * (0.5 - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g1,
      |    CAST(SUM(CAST(floor(x2 * (0.5 - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g2,
      |    COUNT(*) AS n
      |  FROM feats),
      |w1 AS (
      |  SELECT
      |    -(CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b0,
      |    -(CAST(g1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b1,
      |    -(CAST(g2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b2
      |  FROM g1),
      |scored AS (
      |  SELECT f.*, w1.b0, w1.b1, w1.b2,
      |    round(CAST(1 AS DOUBLE) /
      |      (1 + exp(-(w1.b0 * f.x0 + w1.b1 * f.x1 + w1.b2 * f.x2))),
      |      6) AS p
      |  FROM feats f, w1),
      |g2 AS (
      |  SELECT
      |    CAST(SUM(CAST(floor(x0 * (p - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g0,
      |    CAST(SUM(CAST(floor(x1 * (p - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g1,
      |    CAST(SUM(CAST(floor(x2 * (p - y) * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g2,
      |    COUNT(*) AS n,
      |    MIN(b0) AS b0, MIN(b1) AS b1, MIN(b2) AS b2
      |  FROM scored),
      |w2 AS (
      |  SELECT
      |    b0 - CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b0,
      |    b1 - CAST(g1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b1,
      |    b2 - CAST(g2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b2
      |  FROM g2)
      |SELECT CAST(1 AS BIGINT) AS step, b0, b1, b2 FROM w1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS step, b0, b1, b2 FROM w2
      |ORDER BY step""".stripMargin

  /** Closed-form simple linear regression (OLS normal equations) —
    * in-engine analytics without an iterative loop: ONE map-side-
    * combinable aggregate collects the five power sums (n, Σx, Σy,
    * Σx², Σxy, Σy²) as EXACT decimals, and slope/intercept/R² fall
    * out of fixed scalar expressions over them. The 100 TB regression
    * is one scan + a one-row reduce.
    *
    * Determinism: the power sums are decimal-exact (associativity-
    * free); each is cast to double ONCE and the closed-form
    * expressions are written with identical shape in both engines,
    * so every emitted double is IEEE-identical. */
  def linreg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d = graft.Tables.lineitem(s, dir)
      .select(col("l_quantity").cast(DecimalType(18, 2)).as("x"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
    val sums = d.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(col("x")).cast(DoubleType).as("sx"),
      sum(col("y")).cast(DoubleType).as("sy"),
      sum((col("x") * col("x")).cast(DecimalType(38, 4)))
        .cast(DoubleType).as("sxx"),
      sum((col("x") * col("y")).cast(DecimalType(38, 4)))
        .cast(DoubleType).as("sxy"),
      sum((col("y") * col("y")).cast(DecimalType(38, 4)))
        .cast(DoubleType).as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varx = col("n") * col("sxx") - col("sx") * col("sx")
    val vary = col("n") * col("syy") - col("sy") * col("sy")
    val slope = cov / varx
    sums.select(
      col("n").cast("long").as("n"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
      ((cov * cov) / (varx * vary)).as("r2"))
  }

  // Cramer's-rule solution of the 3×3 ridge normal equations
  // (A + λ·diag(0,1,1))·β = b for y ~ β0 + β1·x1 + β2·x2, λ = 1, the
  // intercept unpenalized. The FOUR determinant expansions are kept
  // as shared SQL text and pasted verbatim into BOTH the Spark
  // selectExpr and the DuckDB oracle, so the double expression trees
  // are identical by construction (the [[linreg]] determinism idiom,
  // one level up in dimension).
  private val ridgeDet: String =
    "(n*((sxx1+1.0)*(sxx2+1.0) - sx12*sx12)" +
    " - sx1*(sx1*(sxx2+1.0) - sx12*sx2)" +
    " + sx2*(sx1*sx12 - (sxx1+1.0)*sx2))"
  private val ridgeDet1: String =
    "(sy*((sxx1+1.0)*(sxx2+1.0) - sx12*sx12)" +
    " - sx1*(sx1y*(sxx2+1.0) - sx12*sx2y)" +
    " + sx2*(sx1y*sx12 - (sxx1+1.0)*sx2y))"
  private val ridgeDet2: String =
    "(n*(sx1y*(sxx2+1.0) - sx12*sx2y)" +
    " - sy*(sx1*(sxx2+1.0) - sx12*sx2)" +
    " + sx2*(sx1*sx2y - sx1y*sx2))"
  private val ridgeDet3: String =
    "(n*((sxx1+1.0)*sx2y - sx1y*sx12)" +
    " - sx1*(sx1*sx2y - sx1y*sx2)" +
    " + sy*(sx1*sx12 - (sxx1+1.0)*sx2))"

  /** Ridge regression, closed form — two features
    * (l_quantity, l_discount) plus intercept predicting
    * l_extendedprice, λ = 1 on the slope diagonal: the
    * regularized counterpart of [[linreg]] that survives correlated
    * features. One map-combinable pass builds the nine exact decimal
    * power sums; the 3×3 system is solved by Cramer's rule in fixed
    * shared-text double expressions (see [[ridgeDet]]), so both
    * engines emit bit-identical coefficients, rounded 6 dp at the
    * boundary only.
    *
    * Scale: ONE aggregate over the corpus — the d×d Gram path
    * ([[graft.plans.GramAggregator]]) takes over when d outgrows
    * hand-written sums. */
  def ridge(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d = graft.Tables.lineitem(s, dir)
      .select(col("l_quantity").cast(DecimalType(18, 2)).as("x1"),
        col("l_discount").cast(DecimalType(18, 2)).as("x2"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
    d.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("x1")).cast(DoubleType).as("sx1"),
        sum(col("x2")).cast(DoubleType).as("sx2"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum((col("x1") * col("x1")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxx1"),
        sum((col("x1") * col("x2")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx12"),
        sum((col("x2") * col("x2")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxx2"),
        sum((col("x1") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx1y"),
        sum((col("x2") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx2y"))
      .selectExpr("CAST(n AS BIGINT) AS n",
        s"round($ridgeDet1 / $ridgeDet, 6) AS beta0_6",
        s"round($ridgeDet2 / $ridgeDet, 6) AS beta1_6",
        s"round($ridgeDet3 / $ridgeDet, 6) AS beta2_6")
  }

  val ridgeSql: String =
    s"""WITH d AS (
      |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
      |    CAST(l_discount AS DECIMAL(18,2)) AS x2,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x1) AS DOUBLE) AS sx1,
      |    CAST(SUM(x2) AS DOUBLE) AS sx2,
      |    CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,4))) AS DOUBLE) AS sxx1,
      |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS sx12,
      |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS sxx2,
      |    CAST(SUM(CAST(x1 * y AS DECIMAL(38,4))) AS DOUBLE) AS sx1y,
      |    CAST(SUM(CAST(x2 * y AS DECIMAL(38,4))) AS DOUBLE) AS sx2y
      |  FROM d)
      |SELECT CAST(n AS BIGINT) AS n,
      |  round($ridgeDet1 / $ridgeDet, 6) AS beta0_6,
      |  round($ridgeDet2 / $ridgeDet, 6) AS beta1_6,
      |  round($ridgeDet3 / $ridgeDet, 6) AS beta2_6
      |FROM sums""".stripMargin

  val linregSql: String =
    """WITH d AS (
      |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx,
      |    CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
      |  FROM d)
      |SELECT CAST(n AS BIGINT) AS n,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
      |    AS intercept,
      |  ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |    ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      |FROM sums""".stripMargin

  /** Deterministic k-fold assignment (k = 5) with per-fold stratum
    * diagnostics — the reproducible cross-validation split: fold =
    * overflow-safe multiplicative hash of doc_id (the
    * [[TrainingData]] rowHash discipline, reduced mod k), so any two
    * runs — and any two ENGINES — assign identical folds with no RNG
    * state. Output is the (fold × lang) census a CV harness checks
    * before training: balanced sizes, strata represented everywhere.
    *
    * Scale: pure projection + one map-combinable groupBy; the fold
    * key is computed scan-side, nothing moves but the census rows. */
  def kfold(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"),
        pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(k.toLong)).as("fold"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("fold"), col("lang"))

  val kfoldSql: String =
    """SELECT ((doc_id % 1000003 + 1000003) % 1000003)
      |    * 2654435761 % 5 AS fold,
      |  lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY fold, lang""".stripMargin

  /** Multinomial naive Bayes trained in-engine (add-one smoothing)
    * and applied back to the corpus, emitting the language confusion
    * matrix — train-where-the-data-lives for the highest-volume
    * curation classifier there is (language ID; the same plan serves
    * topic/quality/toxicity given labels). Every log term — priors
    * and the FULL vocab × class likelihood grid (unseen pairs get
    * the +1 floor) — is 1e-6-snapped to longs BEFORE the per-(doc,
    * class) sum, so scores are exact integers; argmax breaks ties on
    * class name. A doc's score row count is `tokens × classes` via
    * the weight join, aggregated by key — never a cross join of the
    * corpus.
    *
    * Scale: the likelihood grid is O(vocab × classes) built from a
    * map-combined (class, term) count and broadcast; the corpus
    * shuffles once on doc_id for the score sum and once (tiny) for
    * the confusion census. The per-doc argmax window partitions by
    * doc_id — millions of independent class-sized frames. */
  def naiveBayes(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(lower(col("text")), " ")).as("w"))
    val classes = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val nAll = docs.agg(count(lit(1)).as("n_all"))
    val priors = classes.crossJoin(broadcast(nAll))
      .select(col("cls"),
        floor(log(col("n_docs").cast(DoubleType)
          / col("n_all").cast(DoubleType)) * 1000000.0 + 0.5)
          .cast(LongType).as("lprior"))
    val vocabCol = toks.select(col("w")).distinct()
    val vSize = vocabCol.agg(count(lit(1)).as("v"))
    val clsTok = toks.groupBy(col("lang").as("cls"), col("w"))
      .agg(count(lit(1)).as("c"))
    val clsTot = toks.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("ct"))
    val grid = vocabCol.crossJoin(classes.select(col("cls")))
      .join(clsTok, Seq("cls", "w"), "left")
      .join(clsTot, "cls").crossJoin(broadcast(vSize))
      .select(col("cls"), col("w"),
        floor(log((coalesce(col("c"), lit(0L)) + lit(1L))
            .cast(DoubleType)
          / (col("ct") + col("v")).cast(DoubleType)) * 1000000.0
          + 0.5).cast(LongType).as("lw"))
    val tf = toks.groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val scores = tf.join(broadcast(grid), "w")
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("tf") * col("lw")).as("ll"))
      .join(broadcast(priors), "cls")
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("ll") + col("lprior")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls"))
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("lang").as("true_lang"),
        col("cls").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  val naiveBayesSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |classes AS (SELECT lang AS cls, COUNT(*) AS n_docs
      |            FROM documents GROUP BY lang),
      |nall AS (SELECT COUNT(*) AS n_all FROM documents),
      |priors AS (
      |  SELECT cls, CAST(floor(ln(CAST(n_docs AS DOUBLE)
      |    / CAST(n_all AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |    AS lprior
      |  FROM classes CROSS JOIN nall),
      |vocab AS (SELECT DISTINCT w FROM toks),
      |vs AS (SELECT COUNT(*) AS v FROM vocab),
      |clstok AS (SELECT lang AS cls, w, COUNT(*) AS c
      |           FROM toks GROUP BY lang, w),
      |clstot AS (SELECT lang AS cls, COUNT(*) AS ct
      |           FROM toks GROUP BY lang),
      |grid AS (
      |  SELECT cl.cls, vocab.w,
      |    CAST(floor(ln(CAST(COALESCE(clstok.c, 0) + 1 AS DOUBLE)
      |      / CAST(clstot.ct + vs.v AS DOUBLE)) * 1000000.0 + 0.5)
      |      AS BIGINT) AS lw
      |  FROM vocab CROSS JOIN (SELECT cls FROM classes) cl
      |  LEFT JOIN clstok ON clstok.cls = cl.cls AND clstok.w = vocab.w
      |  JOIN clstot ON clstot.cls = cl.cls
      |  CROSS JOIN vs),
      |tf AS (SELECT doc_id, lang, w, COUNT(*) AS tf
      |       FROM toks GROUP BY doc_id, lang, w),
      |scores AS (
      |  SELECT tf.doc_id, tf.lang, grid.cls,
      |    SUM(tf.tf * grid.lw) + ANY_VALUE(priors.lprior) AS score
      |  FROM tf JOIN grid USING (w)
      |  JOIN priors ON priors.cls = grid.cls
      |  GROUP BY tf.doc_id, tf.lang, grid.cls),
      |pred AS (
      |  SELECT doc_id, lang, cls,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, cls) AS rn
      |  FROM scores)
      |SELECT lang AS true_lang, cls AS pred_lang, COUNT(*) AS n
      |FROM pred WHERE rn = 1
      |GROUP BY lang, cls
      |ORDER BY true_lang, pred_lang""".stripMargin

  /** Decision-stump induction by exact information gain — the split
    * step of every tree/GBDT learner, run as aggregations: bin the
    * feature (n_chars) into 16 equi-width integer buckets, build
    * per-(bucket, class) counts in one map-combinable pass, and score
    * every internal edge by weighted-entropy reduction using the
    * identity `n·H(a,b) = n·ln n − a·ln a − b·ln b` — each F-term is
    * a 1e-6-snapped long, so gains subtract exactly and the argmax
    * (ties → lowest edge) is hash-stable across engines.
    *
    * Scale: the corpus-wide work is ONE 16×2-cell aggregate; the
    * split search runs on that metadata-sized frame via a 16-row
    * cumulative window. A depth-d tree is d such passes over
    * leaf-filtered data — the classic distributed tree recipe
    * (PLANET/XGBoost-histogram), of which this is the verifiable
    * kernel. Label: lang = 'en'. */
  /** F(a,b) = (a+b)ln(a+b) − a·ln a − b·ln b, 1e-6-snapped; the
    * snapped-long identity keeps gain arithmetic integer-exact. */
  private def entropyF(a: Column, b: Column): Column = {
    def xlnx(c: Column) =
      when(c > 0, c.cast(DoubleType) * log(c.cast(DoubleType)))
        .otherwise(lit(0.0))
    floor((xlnx(a + b) - xlnx(a) - xlnx(b)) * 1000000.0 + 0.5)
      .cast(LongType)
  }

  /** The same F-term as SQL text (a/b are SQL expressions). */
  private def entropyFSql(a: String, b: String): String =
    s"""CAST(floor((CASE WHEN ($a) + ($b) > 0
       |    THEN (($a) + ($b)) * ln(($a) + ($b)) ELSE 0 END
       |  - CASE WHEN ($a) > 0 THEN ($a) * ln($a) ELSE 0 END
       |  - CASE WHEN ($b) > 0 THEN ($b) * ln($b) ELSE 0 END)
       |  * 1000000.0 + 0.5) AS BIGINT)""".stripMargin

  def stump(s: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("n_chars").cast(LongType).as("x"),
        (col("lang") === "en").cast(IntegerType).as("y"))
    val rng = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val binned = docs.crossJoin(broadcast(rng))
      .select(expr(s"((x - mn) * $bins) div (mx - mn + 1)").as("bin"),
        col("y"), col("mn"), col("mx"))
    val cells = binned.groupBy(col("bin"), col("mn"), col("mx"))
      .agg(sum(col("y")).cast(LongType).as("pos"),
        sum(lit(1) - col("y")).cast(LongType).as("neg"))
    val f = entropyF _
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // 16-row frame: the unpartitioned window is metadata-sized.
    val cum = cells
      .withColumn("cpos", sum(col("pos")).over(w))
      .withColumn("cneg", sum(col("neg")).over(w))
      .withColumn("tpos", sum(col("pos")).over(
        Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("tneg", sum(col("neg")).over(
        Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      .filter(col("bin") < bins - 1) // internal edges only
    cum.select(col("bin"), col("mn"), col("mx"),
        (f(col("tpos"), col("tneg")) - f(col("cpos"), col("cneg")) -
          f(col("tpos") - col("cpos"), col("tneg") - col("cneg")))
          .as("gain_e6"),
        col("cpos"), col("cneg"),
        (col("tpos") - col("cpos")).as("rpos"),
        (col("tneg") - col("cneg")).as("rneg"))
      .orderBy(col("gain_e6").desc, col("bin"))
      .limit(1)
      // threshold: largest x routed left = upper edge of the bin
      // (integer div on BOTH sides — a double divide would round in
      // DuckDB's BIGINT cast but truncate in Spark's)
      .select(col("bin"),
        expr(s"mn + (((bin + 1) * (mx - mn + 1)) div $bins)")
          .as("threshold"),
        col("gain_e6"), col("cpos"), col("cneg"), col("rpos"),
        col("rneg"))
  }

  val stumpSql: String =
    """WITH d AS (
      |  SELECT CAST(n_chars AS BIGINT) AS x,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |rng AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d),
      |cells AS (
      |  SELECT ((x - mn) * 16) // (mx - mn + 1) AS bin, mn, mx,
      |    CAST(SUM(y) AS BIGINT) AS pos,
      |    CAST(SUM(1 - y) AS BIGINT) AS neg
      |  FROM d CROSS JOIN rng
      |  GROUP BY 1, 2, 3),
      |cum AS (
      |  SELECT bin, mn, mx,
      |    SUM(pos) OVER (ORDER BY bin) AS cpos,
      |    SUM(neg) OVER (ORDER BY bin) AS cneg,
      |    SUM(pos) OVER () AS tpos, SUM(neg) OVER () AS tneg
      |  FROM cells),
      |sc AS (
      |  SELECT bin, mn, mx, cpos, cneg,
      |    tpos - cpos AS rpos, tneg - cneg AS rneg,
      |    CAST(floor((CASE WHEN tpos + tneg > 0
      |        THEN (tpos + tneg) * ln(tpos + tneg) ELSE 0 END
      |      - CASE WHEN tpos > 0 THEN tpos * ln(tpos) ELSE 0 END
      |      - CASE WHEN tneg > 0 THEN tneg * ln(tneg) ELSE 0 END)
      |      * 1000000.0 + 0.5) AS BIGINT)
      |    - CAST(floor((CASE WHEN cpos + cneg > 0
      |        THEN (cpos + cneg) * ln(cpos + cneg) ELSE 0 END
      |      - CASE WHEN cpos > 0 THEN cpos * ln(cpos) ELSE 0 END
      |      - CASE WHEN cneg > 0 THEN cneg * ln(cneg) ELSE 0 END)
      |      * 1000000.0 + 0.5) AS BIGINT)
      |    - CAST(floor((CASE WHEN tpos - cpos + tneg - cneg > 0
      |        THEN (tpos - cpos + tneg - cneg)
      |          * ln(tpos - cpos + tneg - cneg) ELSE 0 END
      |      - CASE WHEN tpos - cpos > 0
      |        THEN (tpos - cpos) * ln(tpos - cpos) ELSE 0 END
      |      - CASE WHEN tneg - cneg > 0
      |        THEN (tneg - cneg) * ln(tneg - cneg) ELSE 0 END)
      |      * 1000000.0 + 0.5) AS BIGINT) AS gain_e6
      |  FROM cum WHERE bin < 15)
      |SELECT bin,
      |  CAST(mn + ((bin + 1) * (mx - mn + 1)) // 16 AS BIGINT)
      |    AS threshold,
      |  gain_e6, CAST(cpos AS BIGINT) AS cpos,
      |  CAST(cneg AS BIGINT) AS cneg,
      |  CAST(rpos AS BIGINT) AS rpos, CAST(rneg AS BIGINT) AS rneg
      |FROM sc ORDER BY gain_e6 DESC, bin LIMIT 1""".stripMargin

  /** Depth-2 tree growth — the distributed-tree recipe on top of
    * [[stump]]: the root split (a 1-row driver collect — the MODEL,
    * like every kernel's collected sketch) partitions rows into two
    * leaves, and then ONE additional histogram pass builds BOTH
    * leaves' 16×2 tables simultaneously via groupBy(leaf, bin) —
    * the PLANET / XGBoost-histogram trick: tree depth costs one scan
    * per LEVEL, never one per node. Split search per leaf runs on
    * the leaf-partitioned cumulative window (metadata-sized), ties
    * to the lowest bin, internal edges only (a leaf's last occupied
    * bin cannot split). */
  def treeDepth2(s: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    val rootBin = stump(s, dir, bins).collect()(0).getLong(0)
    val docs = Tables.documents(s, dir)
      .select(col("n_chars").cast(LongType).as("x"),
        (col("lang") === "en").cast(IntegerType).as("y"))
    val rng = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cells = docs.crossJoin(broadcast(rng))
      .select(expr(s"((x - mn) * $bins) div (mx - mn + 1)").as("bin"),
        col("y"), col("mn"), col("mx"))
      .withColumn("leaf",
        when(col("bin") <= rootBin, lit("L")).otherwise(lit("R")))
      .groupBy(col("leaf"), col("bin"), col("mn"), col("mx"))
      .agg(sum(col("y")).cast(LongType).as("pos"),
        sum(lit(1) - col("y")).cast(LongType).as("neg"))
    val w = Window.partitionBy(col("leaf")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tw = Window.partitionBy(col("leaf"))
    val cum = cells
      .withColumn("cpos", sum(col("pos")).over(w))
      .withColumn("cneg", sum(col("neg")).over(w))
      .withColumn("tpos", sum(col("pos")).over(tw))
      .withColumn("tneg", sum(col("neg")).over(tw))
      .withColumn("maxbin", max(col("bin")).over(tw))
      .filter(col("bin") < col("maxbin"))
    val scored = cum.select(col("leaf"), col("bin"), col("mn"), col("mx"),
      (entropyF(col("tpos"), col("tneg")) -
        entropyF(col("cpos"), col("cneg")) -
        entropyF(col("tpos") - col("cpos"), col("tneg") - col("cneg")))
        .as("gain_e6"),
      col("cpos"), col("cneg"),
      (col("tpos") - col("cpos")).as("rpos"),
      (col("tneg") - col("cneg")).as("rneg"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("leaf"))
          .orderBy(col("gain_e6").desc, col("bin"))))
      .filter(col("rk") === 1)
      .select(col("leaf"), col("bin"),
        expr(s"mn + (((bin + 1) * (mx - mn + 1)) div $bins)")
          .as("threshold"),
        col("gain_e6"), col("cpos"), col("cneg"), col("rpos"),
        col("rneg"))
      .orderBy(col("leaf"))
  }

  val treeDepth2Sql: String = {
    val gain =
      entropyFSql("tpos", "tneg") + "\n  - " +
      entropyFSql("cpos", "cneg") + "\n  - " +
      entropyFSql("tpos - cpos", "tneg - cneg")
    s"""WITH d AS (
       |  SELECT CAST(n_chars AS BIGINT) AS x,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |rng AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d),
       |cells AS (
       |  SELECT ((x - mn) * 16) // (mx - mn + 1) AS bin, mn, mx,
       |    CAST(SUM(y) AS BIGINT) AS pos,
       |    CAST(SUM(1 - y) AS BIGINT) AS neg
       |  FROM d CROSS JOIN rng GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT bin, SUM(pos) OVER (ORDER BY bin) AS cpos,
       |    SUM(neg) OVER (ORDER BY bin) AS cneg,
       |    SUM(pos) OVER () AS tpos, SUM(neg) OVER () AS tneg
       |  FROM cells),
       |root AS (
       |  SELECT bin FROM (
       |    SELECT bin, $gain AS gain_e6 FROM cum WHERE bin < 15)
       |  ORDER BY gain_e6 DESC, bin LIMIT 1),
       |cells2 AS (
       |  SELECT CASE WHEN ((x - mn) * 16) // (mx - mn + 1)
       |        <= (SELECT bin FROM root) THEN 'L' ELSE 'R' END AS leaf,
       |    ((x - mn) * 16) // (mx - mn + 1) AS bin, mn, mx,
       |    CAST(SUM(y) AS BIGINT) AS pos,
       |    CAST(SUM(1 - y) AS BIGINT) AS neg
       |  FROM d CROSS JOIN rng GROUP BY 1, 2, 3, 4),
       |cum2 AS (
       |  SELECT leaf, bin, mn, mx,
       |    SUM(pos) OVER (PARTITION BY leaf ORDER BY bin) AS cpos,
       |    SUM(neg) OVER (PARTITION BY leaf ORDER BY bin) AS cneg,
       |    SUM(pos) OVER (PARTITION BY leaf) AS tpos,
       |    SUM(neg) OVER (PARTITION BY leaf) AS tneg,
       |    MAX(bin) OVER (PARTITION BY leaf) AS maxbin
       |  FROM cells2),
       |sc2 AS (
       |  SELECT leaf, bin, mn, mx, cpos, cneg,
       |    tpos - cpos AS rpos, tneg - cneg AS rneg,
       |    $gain AS gain_e6
       |  FROM cum2 WHERE bin < maxbin),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY leaf
       |    ORDER BY gain_e6 DESC, bin) AS rk FROM sc2)
       |SELECT leaf, bin,
       |  CAST(mn + ((bin + 1) * (mx - mn + 1)) // 16 AS BIGINT)
       |    AS threshold,
       |  gain_e6, CAST(cpos AS BIGINT) AS cpos,
       |  CAST(cneg AS BIGINT) AS cneg,
       |  CAST(rpos AS BIGINT) AS rpos, CAST(rneg AS BIGINT) AS rneg
       |FROM ranked WHERE rk = 1 ORDER BY leaf""".stripMargin
  }

  /** One L2-boosting round on top of a least-squares stump — the
    * gradient-boosting KERNEL (Friedman 2001) in histogram form:
    * round 1 fits a variance-gain stump to y; round 2 fits a second
    * stump to the RESIDUALS y − γ_leaf. The distributed insight is
    * that with a fixed global bin grid both rounds derive from the
    * SAME 16-cell (pos, cnt) histogram — residuals are constant
    * within (bin, y), so the residual sums per bin are pure
    * arithmetic over round-1 aggregates: t_b = pos_b·D −
    * cnt_b·S_leaf(b)·n_other(b), with every residual pre-scaled by
    * D = n_L·n_R so the whole second round stays INTEGER-exact
    * (|t| ≤ n⁴ — BIGINT-safe to ~55 k rows; wider corpora cast the
    * t-accumulators to DECIMAL(38,0), same plan). ONE scan of the
    * corpus total; both split searches run on 16-row metadata
    * windows. Split scores (S_L²/n_L + S_R²/n_R) are used for
    * ORDERING only — identical IEEE double sequences on both
    * engines, never emitted — and the gate's columns are the exact
    * integers (split sums/counts and the residual sums), from which
    * the leaf values γ = S/n and boosting increments γ₂ = T/(D·c)
    * are rational reconstructions. */
  def gbdtRound(s: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("n_chars").cast(LongType).as("x"),
        (col("lang") === "en").cast(IntegerType).as("y"))
    val rng = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cells = docs.crossJoin(broadcast(rng))
      .select(expr(s"((x - mn) * $bins) div (mx - mn + 1)").as("bin"),
        col("y"), col("mn"), col("mx"))
      .groupBy(col("bin"), col("mn"), col("mx"))
      .agg(sum(col("y")).cast(LongType).as("pos"),
        count(lit(1)).as("cnt"))
    val wc = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wt = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    def splitScore(sl: Column, cl: Column, sr: Column, cr: Column) =
      sl.cast(DoubleType) * sl.cast(DoubleType) / cl.cast(DoubleType) +
        sr.cast(DoubleType) * sr.cast(DoubleType) / cr.cast(DoubleType)
    // 16-row frames: every window below is metadata-sized.
    val edges1 = cells
      .withColumn("sl", sum(col("pos")).over(wc))
      .withColumn("cl", sum(col("cnt")).over(wc))
      .withColumn("st", sum(col("pos")).over(wt))
      .withColumn("ct", sum(col("cnt")).over(wt))
      .withColumn("maxbin", max(col("bin")).over(wt))
      .filter(col("bin") < col("maxbin")) // both sides non-empty
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("cr", col("ct") - col("cl"))
    val best1 = edges1
      .withColumn("rk", row_number().over(Window.orderBy(
        splitScore(col("sl"), col("cl"), col("sr"), col("cr")).desc,
        col("bin"))))
      .filter(col("rk") === 1)
      .select(col("bin").as("bin1"), col("mn"), col("mx"),
        col("sl"), col("cl"), col("sr"), col("cr"),
        (col("cl") * col("cr")).as("d"))
    val edges2 = cells.select(col("bin"), col("pos"), col("cnt"))
      .crossJoin(broadcast(best1))
      .withColumn("t",
        col("pos") * col("d") - col("cnt") *
          when(col("bin") <= col("bin1"), col("sl") * col("cr"))
            .otherwise(col("sr") * col("cl")))
      .withColumn("tl", sum(col("t")).over(wc))
      .withColumn("nl", sum(col("cnt")).over(wc))
      .withColumn("tt", sum(col("t")).over(wt))
      .withColumn("nt", sum(col("cnt")).over(wt))
      .withColumn("maxbin", max(col("bin")).over(wt))
      .filter(col("bin") < col("maxbin"))
      .withColumn("tr", col("tt") - col("tl"))
      .withColumn("nr", col("nt") - col("nl"))
    edges2
      .withColumn("rk", row_number().over(Window.orderBy(
        splitScore(col("tl"), col("nl"), col("tr"), col("nr")).desc,
        col("bin"))))
      .filter(col("rk") === 1)
      .select(col("bin1"),
        expr(s"mn + (((bin1 + 1) * (mx - mn + 1)) div $bins)")
          .as("thr1"),
        col("sl").as("s_l"), col("cl").as("c_l"),
        col("sr").as("s_r"), col("cr").as("c_r"),
        col("bin").as("bin2"),
        expr(s"mn + (((bin + 1) * (mx - mn + 1)) div $bins)")
          .as("thr2"),
        col("tl").as("t_l"), col("nl").as("n_l"),
        col("tr").as("t_r"), col("nr").as("n_r"),
        col("d"))
  }

  val gbdtRoundSql: String = {
    def score(sl: String, cl: String, sr: String, cr: String) =
      s"""CAST($sl AS DOUBLE) * CAST($sl AS DOUBLE) / CAST($cl AS DOUBLE)
         |      + CAST($sr AS DOUBLE) * CAST($sr AS DOUBLE)
         |        / CAST($cr AS DOUBLE)""".stripMargin
    s"""WITH d0 AS (
       |  SELECT CAST(n_chars AS BIGINT) AS x,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |rng AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d0),
       |cells AS (
       |  SELECT ((x - mn) * 16) // (mx - mn + 1) AS bin, mn, mx,
       |    CAST(SUM(y) AS BIGINT) AS pos,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM d0 CROSS JOIN rng GROUP BY 1, 2, 3),
       |cum1 AS (
       |  SELECT bin, mn, mx,
       |    CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS sl,
       |    CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cl,
       |    CAST(SUM(pos) OVER () AS BIGINT) AS st,
       |    CAST(SUM(cnt) OVER () AS BIGINT) AS ct,
       |    MAX(bin) OVER () AS maxbin
       |  FROM cells),
       |best1 AS (
       |  SELECT bin AS bin1, mn, mx, sl, cl,
       |    st - sl AS sr, ct - cl AS cr, cl * (ct - cl) AS d
       |  FROM cum1 WHERE bin < maxbin
       |  ORDER BY ${score("sl", "cl", "(st - sl)", "(ct - cl)")} DESC,
       |    bin LIMIT 1),
       |cells2 AS (
       |  SELECT c.bin,
       |    c.pos * b.d - c.cnt *
       |      (CASE WHEN c.bin <= b.bin1 THEN b.sl * b.cr
       |            ELSE b.sr * b.cl END) AS t,
       |    c.cnt
       |  FROM cells c CROSS JOIN best1 b),
       |cum2 AS (
       |  SELECT bin,
       |    CAST(SUM(t) OVER (ORDER BY bin) AS BIGINT) AS tl,
       |    CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS nl,
       |    CAST(SUM(t) OVER () AS BIGINT) AS tt,
       |    CAST(SUM(cnt) OVER () AS BIGINT) AS nt,
       |    MAX(bin) OVER () AS maxbin
       |  FROM cells2),
       |best2 AS (
       |  SELECT bin AS bin2, tl, nl, tt - tl AS tr, nt - nl AS nr
       |  FROM cum2 WHERE bin < maxbin
       |  ORDER BY ${score("tl", "nl", "(tt - tl)", "(nt - nl)")} DESC,
       |    bin LIMIT 1)
       |SELECT b1.bin1,
       |  CAST(b1.mn + ((b1.bin1 + 1) * (b1.mx - b1.mn + 1)) // 16
       |    AS BIGINT) AS thr1,
       |  b1.sl AS s_l, b1.cl AS c_l, b1.sr AS s_r, b1.cr AS c_r,
       |  b2.bin2,
       |  CAST(b1.mn + ((b2.bin2 + 1) * (b1.mx - b1.mn + 1)) // 16
       |    AS BIGINT) AS thr2,
       |  b2.tl AS t_l, b2.nl AS n_l, b2.tr AS t_r, b2.nr AS n_r,
       |  b1.d
       |FROM best1 b1 CROSS JOIN best2 b2""".stripMargin
  }

  /** Weight-of-evidence / information-value feature scoring (the
    * credit-scoring binning diagnostic): the [[stump]] 16-bin
    * equi-width histogram re-read as an evidence table. Per occupied
    * bin, WOE = ln(p_bin/P) − ln(n_bin/N) with the ±0.5 Laplace
    * adjustment folded in integer form ((2p+1)/(2P+bins) — numerators
    * and denominators all exact BIGINTs, logs taken of integers), and
    * the IV contribution ((p/P − n/N)·WOE). Both emit as snapped
    * longs computed by ONE fixed-shape double expression each —
    * identical operand order in the oracle, so cross-engine
    * bit-equal (the Mining-lift discipline).
    *
    * Plan: the same two corpus scans as [[stump]] (range probe +
    * histogram groupBy); totals come from a window over the ≤16-row
    * cell frame — metadata-sized, like every kernel's model state. */
  def woeIv(s: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("n_chars").cast(LongType).as("x"),
        (col("lang") === "en").cast(IntegerType).as("y"))
    val rng = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cells = docs.crossJoin(broadcast(rng))
      .select(expr(s"((x - mn) * $bins) div (mx - mn + 1)").as("bin"),
        col("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).cast(LongType).as("pos"),
        sum(lit(1) - col("y")).cast(LongType).as("neg"))
    val tw = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    val t = cells
      .withColumn("tpos", sum(col("pos")).over(tw))
      .withColumn("tneg", sum(col("neg")).over(tw))
    val pRate = (col("pos") * 2 + 1).cast(DoubleType) /
      (col("tpos") * 2 + bins).cast(DoubleType)
    val nRate = (col("neg") * 2 + 1).cast(DoubleType) /
      (col("tneg") * 2 + bins).cast(DoubleType)
    val woe = log((col("pos") * 2 + 1).cast(DoubleType)) -
      log((col("tpos") * 2 + bins).cast(DoubleType)) -
      log((col("neg") * 2 + 1).cast(DoubleType)) +
      log((col("tneg") * 2 + bins).cast(DoubleType))
    t.select(col("bin"), col("pos"), col("neg"),
        floor(woe * 1000000.0 + 0.5).cast(LongType).as("woe_e6"),
        floor((pRate - nRate) * woe * 1000000000.0 + 0.5)
          .cast(LongType).as("iv_e9"))
      .orderBy(col("bin"))
  }

  val woeIvSql: String =
    """WITH d AS (
      |  SELECT CAST(n_chars AS BIGINT) AS x,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |rng AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d),
      |cells AS (
      |  SELECT ((x - mn) * 16) // (mx - mn + 1) AS bin,
      |    CAST(SUM(y) AS BIGINT) AS pos,
      |    CAST(SUM(1 - y) AS BIGINT) AS neg
      |  FROM d CROSS JOIN rng
      |  GROUP BY 1),
      |t AS (
      |  SELECT bin, pos, neg,
      |    CAST(SUM(pos) OVER () AS BIGINT) AS tpos,
      |    CAST(SUM(neg) OVER () AS BIGINT) AS tneg
      |  FROM cells)
      |SELECT bin, pos, neg,
      |  CAST(floor((ln(CAST(pos * 2 + 1 AS DOUBLE))
      |    - ln(CAST(tpos * 2 + 16 AS DOUBLE))
      |    - ln(CAST(neg * 2 + 1 AS DOUBLE))
      |    + ln(CAST(tneg * 2 + 16 AS DOUBLE))) * 1000000.0 + 0.5)
      |    AS BIGINT) AS woe_e6,
      |  CAST(floor((CAST(pos * 2 + 1 AS DOUBLE)
      |      / CAST(tpos * 2 + 16 AS DOUBLE)
      |    - CAST(neg * 2 + 1 AS DOUBLE)
      |      / CAST(tneg * 2 + 16 AS DOUBLE))
      |    * (ln(CAST(pos * 2 + 1 AS DOUBLE))
      |      - ln(CAST(tpos * 2 + 16 AS DOUBLE))
      |      - ln(CAST(neg * 2 + 1 AS DOUBLE))
      |      + ln(CAST(tneg * 2 + 16 AS DOUBLE)))
      |    * 1000000000.0 + 0.5) AS BIGINT) AS iv_e9
      |FROM t ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- //

  /** Smoothed mean target encoding with a leave-one-out variant —
    * the categorical featurization trick gradient-boosting pipelines
    * lean on (Micci-Barreca, SIGKDD Expl. 2001). Category =
    * `o_orderpriority`, target = 1(o_orderstatus = 'F');
    * enc = (pos_c + m·prior) / (n_c + m) with m = 20, and the
    * leakage-safe LOO form removes the row's own target from its
    * category before encoding.
    *
    * Determinism: the encodings are stated as ONE integer floor
    * division each — enc_e6 = (pos_c·N + m·P)·1e6 div (N·(n_c+m)) —
    * so no double arithmetic touches the output. All operands are
    * non-negative, where Spark `div` (truncate) and DuckDB `//`
    * (floor) agree.
    *
    * Scale: the category table is a map-combinable groupBy (a handful
    * of rows) broadcast back; the per-row encode is a projection. The
    * integer numerator holds exactly to N ≈ 3e9 rows; past that the
    * same statement runs on DECIMAL(38,0) unchanged. */
  def targetEncode(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderpriority").as("category"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val tot = o.agg(count(lit(1)).as("total_n"),
      sum(col("y")).as("total_pos"))
    val per = o.groupBy(col("category")).agg(
      count(lit(1)).as("n_c"), sum(col("y")).as("pos_c"))
    o.filter(col("o_orderkey") < 100)
      .join(broadcast(per), "category")
      .crossJoin(broadcast(tot))
      .select(col("o_orderkey"), col("category"), col("y"),
        expr("(pos_c * total_n + 20 * total_pos) * 1000000" +
          " div (total_n * (n_c + 20))").as("enc_e6"),
        expr("((pos_c - y) * total_n + 20 * total_pos) * 1000000" +
          " div (total_n * (n_c - 1 + 20))").as("loo_e6"))
      .orderBy(col("o_orderkey"))
  }

  val targetEncodeSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_orderpriority AS category,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |tot AS (SELECT COUNT(*) AS total_n,
      |               CAST(SUM(y) AS BIGINT) AS total_pos FROM o),
      |per AS (SELECT category, COUNT(*) AS n_c,
      |               CAST(SUM(y) AS BIGINT) AS pos_c
      |        FROM o GROUP BY category)
      |SELECT o.o_orderkey, o.category, CAST(o.y AS BIGINT) AS y,
      |  CAST((pos_c * total_n + 20 * total_pos) * 1000000
      |    // (total_n * (n_c + 20)) AS BIGINT) AS enc_e6,
      |  CAST(((pos_c - o.y) * total_n + 20 * total_pos) * 1000000
      |    // (total_n * (n_c - 1 + 20)) AS BIGINT) AS loo_e6
      |FROM o
      |JOIN per ON o.category = per.category
      |CROSS JOIN tot
      |WHERE o.o_orderkey < 100
      |ORDER BY o.o_orderkey""".stripMargin

  /** Hashing-trick featurization (Weinberger et al., ICML'09): each
    * token lands in one of 64 buckets by a PORTABLE polynomial roll
    * of its character codes (acc·31 + code mod 1e9+7 — the same
    * statement runs on both engines, unlike xxhash), with the
    * next hash bit supplying the collision-cancelling ±1 sign.
    * Output: per-document sparse feature rows (bucket, signed sum,
    * token count).
    *
    * Scale: the hash is a per-token projection (no vocabulary, no
    * dictionary join — the point of the trick); the feature matrix is
    * one (doc, bucket) map-combinable groupBy. Tokens are restricted
    * to [a-z0-9]+ so char codes are ASCII-stable across engines. The
    * doc_id < 10 cut keeps the gate bounded; the statement itself is
    * corpus-shape. */
  def featureHash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .filter(col("doc_id") < 10)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok").rlike("^[a-z0-9]+$"))
    toks
      .withColumn("hv", expr(
        "aggregate(transform(sequence(1, length(tok))," +
          " i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))," +
          " CAST(0 AS BIGINT)," +
          " (acc, x) -> (acc * 31 + x) % 1000000007)"))
      .groupBy(col("doc_id"), (col("hv") % 64).as("bucket"))
      .agg(sum(when(expr("(hv div 64) % 2") === 0, 1L)
        .otherwise(-1L)).as("val"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"), col("bucket"))
  }

  val featureHashSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      t -> regexp_matches(t, '^[a-z0-9]+$'))) AS tok
      |  FROM documents WHERE doc_id < 10),
      |h AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(tok)),
      |        i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
      |  FROM toks)
      |SELECT doc_id, hv % 64 AS bucket,
      |  CAST(SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END)
      |    AS BIGINT) AS val,
      |  COUNT(*) AS n_tokens
      |FROM h GROUP BY doc_id, hv % 64
      |ORDER BY doc_id, bucket""".stripMargin

  /** One-way ANOVA F feature screen: for each numeric lineitem
    * feature, the between/within variance ratio across the 3
    * `l_returnflag` classes — the standard univariate filter for
    * ranking features BEFORE training (the SelectKBest shape). A
    * large F ⇒ class means separate well ⇒ the feature is worth a
    * model's capacity.
    *
    * Determinism: features are per-row snapped to integers first
    * (qty, cents, basis points), all sums/sumsq accumulate EXACTLY
    * (BIGINT / DECIMAL(38,0) — sumsq of cents² × corpus rows
    * overflows BIGINT, decimal does not and DuckDB's HUGEINT mirrors
    * it); the 3 classes are pivoted into FIXED columns in one
    * conditional-aggregation pass, so F is a single fixed-shape
    * double expression over exact integers — identical operand
    * order on both engines, then floored to ppm. No
    * aggregate-over-doubles anywhere.
    *
    * Scale: one map-combinable groupBy(feature) pass over the
    * unpivoted corpus (4 features ⇒ 4× row multiplier on a 3-column
    * projection, not on the table); output is O(features). */
  def anovaF(s: SparkSession, dir: String): DataFrame = {
    val snapped = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("cls"),
      expr("""stack(4,
        'disc_bp',  CAST(ROUND(l_discount * 10000) AS BIGINT),
        'price_cents', CAST(ROUND(l_extendedprice * 100) AS BIGINT),
        'qty',      CAST(l_quantity AS BIGINT),
        'tax_bp',   CAST(ROUND(l_tax * 10000) AS BIGINT))
        AS (feature, x)"""))
    def nC(f: String) = sum(when(col("cls") === f, 1L).otherwise(0L))
    def sC(f: String) = sum(when(col("cls") === f, col("x")).otherwise(0L))
    def qC(f: String) = sum(when(col("cls") === f,
      col("x").cast(DecimalType(38, 0)) * col("x")).otherwise(
      lit(0).cast(DecimalType(38, 0))))
    snapped.groupBy(col("feature"))
      .agg(nC("A").as("n_a"), sC("A").as("s_a"), qC("A").as("q_a"),
        nC("N").as("n_n"), sC("N").as("s_n"), qC("N").as("q_n"),
        nC("R").as("n_r"), sC("R").as("s_r"), qC("R").as("q_r"))
      .select(col("feature"),
        (col("n_a") + col("n_n") + col("n_r")).as("n"),
        expr("""CAST(FLOOR((
          ((CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n_n AS DOUBLE)
          + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))
          - CAST(s_a + s_n + s_r AS DOUBLE) * CAST(s_a + s_n + s_r AS DOUBLE)
            / CAST(n_a + n_n + n_r AS DOUBLE))
          * CAST(n_a + n_n + n_r - 3 AS DOUBLE))
          / ((CAST(q_a + q_n + q_r AS DOUBLE)
          - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n_n AS DOUBLE)
          + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)))
          * 2.0)
          * 1000000.0) AS BIGINT)""").as("f_ppm"))
      .orderBy(col("feature"))
  }

  val anovaFSql: String =
    """WITH u AS (
      |  SELECT l_returnflag AS cls, f.feature, f.x
      |  FROM lineitem, LATERAL (VALUES
      |    ('disc_bp',  CAST(ROUND(l_discount * 10000) AS BIGINT)),
      |    ('price_cents', CAST(ROUND(l_extendedprice * 100) AS BIGINT)),
      |    ('qty',      CAST(l_quantity AS BIGINT)),
      |    ('tax_bp',   CAST(ROUND(l_tax * 10000) AS BIGINT)))
      |    AS f(feature, x)),
      |g AS (
      |  SELECT feature,
      |    CAST(SUM(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN cls = 'A' THEN x ELSE 0 END) AS BIGINT) AS s_a,
      |    SUM(CASE WHEN cls = 'A' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q_a,
      |    CAST(SUM(CASE WHEN cls = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
      |    CAST(SUM(CASE WHEN cls = 'N' THEN x ELSE 0 END) AS BIGINT) AS s_n,
      |    SUM(CASE WHEN cls = 'N' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q_n,
      |    CAST(SUM(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
      |    CAST(SUM(CASE WHEN cls = 'R' THEN x ELSE 0 END) AS BIGINT) AS s_r,
      |    SUM(CASE WHEN cls = 'R' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q_r
      |  FROM u GROUP BY feature)
      |SELECT feature, CAST(n_a + n_n + n_r AS BIGINT) AS n,
      |  CAST(FLOOR((
      |    ((CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n_n AS DOUBLE)
      |    + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))
      |    - CAST(s_a + s_n + s_r AS DOUBLE) * CAST(s_a + s_n + s_r AS DOUBLE)
      |      / CAST(n_a + n_n + n_r AS DOUBLE))
      |    * CAST(n_a + n_n + n_r - 3 AS DOUBLE))
      |    / ((CAST(q_a + q_n + q_r AS DOUBLE)
      |    - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n_n AS DOUBLE)
      |    + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)))
      |    * 2.0)
      |    * 1000000.0) AS BIGINT) AS f_ppm
      |FROM g
      |ORDER BY feature""".stripMargin

  /** Linear-SVM full-batch subgradient steps — the hinge-loss
    * max-margin sibling of [[logregSteps]] (same features, labels
    * remapped to ±1): the subgradient of `max(0, 1 − y·w·x)` is
    * `−y·x` on margin-violating rows and 0 elsewhere, so one step is
    * ONE conditional aggregation. At w=0 every margin is 0 < 1, so
    * step 1 needs no indicator at all; step 2's indicator compares
    * identical doubles on both engines (margins built from the
    * step-1 snapped gradients). Gradients snap to 1e9-scaled longs
    * before the weight update (the logreg discipline) — the sums
    * are order-independent BIGINTs.
    *
    * Scale: each step is a map-combinable aggregate; weights are a
    * broadcast single row. */
  def svmSteps(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(s, dir).select(
      lit(1.0).as("x0"),
      (col("n_chars").cast(DoubleType) / lit(1000.0)).as("x1"),
      ((length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))) /
        col("n_chars").cast(DoubleType)).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(-1.0).as("y"))
    def g9(xj: Column, active: Column): Column =
      sum(when(active,
        floor(-col("y") * xj * 1e9 + 0.5).cast(LongType)).otherwise(0L))
    // Step 1: w = 0 ⇒ all rows active.
    val g1 = feats.agg(
      g9(col("x0"), lit(true)).as("g0"),
      g9(col("x1"), lit(true)).as("g1"),
      g9(col("x2"), lit(true)).as("g2"),
      count(lit(1)).as("n"))
    def upd(g: Column, n: Column): Column =
      g.cast(DoubleType) / (n.cast(DoubleType) * 1e9)
    val w1 = g1.select(
      (-upd(col("g0"), col("n"))).as("b0"),
      (-upd(col("g1"), col("n"))).as("b1"),
      (-upd(col("g2"), col("n"))).as("b2"),
      col("n").as("n_active"))
    // Step 2: only margin violators contribute.
    val scored = feats.crossJoin(broadcast(w1.select(
        col("b0"), col("b1"), col("b2"))))
      .withColumn("active",
        col("y") * (col("b0") * col("x0") + col("b1") * col("x1") +
          col("b2") * col("x2")) < 1.0)
    val g2 = scored.agg(
      g9(col("x0"), col("active")).as("g0"),
      g9(col("x1"), col("active")).as("g1"),
      g9(col("x2"), col("active")).as("g2"),
      count(lit(1)).as("n"),
      sum(when(col("active"), 1L).otherwise(0L)).as("n_active"),
      min(col("b0")).as("b0"), min(col("b1")).as("b1"),
      min(col("b2")).as("b2"))
    val w2 = g2.select(
      (col("b0") - upd(col("g0"), col("n"))).as("b0"),
      (col("b1") - upd(col("g1"), col("n"))).as("b1"),
      (col("b2") - upd(col("g2"), col("n"))).as("b2"),
      col("n_active"))
    w1.select(lit(1L).as("step"), col("b0"), col("b1"), col("b2"),
        col("n_active"))
      .union(w2.select(lit(2L).as("step"), col("b0"), col("b1"),
        col("b2"), col("n_active")))
      .orderBy(col("step"))
  }

  val svmSql: String =
    """WITH feats AS (
      |  SELECT CAST(1 AS DOUBLE) AS x0,
      |    CAST(n_chars AS DOUBLE) / 1000 AS x1,
      |    (length(text) - length(replace(text, ' ', '')))
      |      / CAST(n_chars AS DOUBLE) AS x2,
      |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
      |         ELSE CAST(-1 AS DOUBLE) END AS y
      |  FROM documents),
      |g1 AS (
      |  SELECT
      |    CAST(SUM(CAST(floor(-y * x0 * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g0,
      |    CAST(SUM(CAST(floor(-y * x1 * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g1,
      |    CAST(SUM(CAST(floor(-y * x2 * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g2,
      |    COUNT(*) AS n
      |  FROM feats),
      |w1 AS (
      |  SELECT
      |    -(CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b0,
      |    -(CAST(g1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b1,
      |    -(CAST(g2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) AS b2,
      |    CAST(n AS BIGINT) AS n_active
      |  FROM g1),
      |scored AS (
      |  SELECT f.*, w1.b0, w1.b1, w1.b2,
      |    f.y * (w1.b0 * f.x0 + w1.b1 * f.x1 + w1.b2 * f.x2) < 1.0
      |      AS active
      |  FROM feats f, w1),
      |g2 AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN active THEN
      |      CAST(floor(-y * x0 * 1e9 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS g0,
      |    CAST(SUM(CASE WHEN active THEN
      |      CAST(floor(-y * x1 * 1e9 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS g1,
      |    CAST(SUM(CASE WHEN active THEN
      |      CAST(floor(-y * x2 * 1e9 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS g2,
      |    COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_active,
      |    MIN(b0) AS b0, MIN(b1) AS b1, MIN(b2) AS b2
      |  FROM scored),
      |w2 AS (
      |  SELECT
      |    b0 - CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b0,
      |    b1 - CAST(g1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b1,
      |    b2 - CAST(g2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS b2,
      |    n_active
      |  FROM g2)
      |SELECT CAST(1 AS BIGINT) AS step, b0, b1, b2, n_active FROM w1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), b0, b1, b2, n_active FROM w2
      |ORDER BY step""".stripMargin

  /** UCB1 bandit scoring (Auer et al., ML 2002) — the deterministic
    * exploration policy an experimentation pipeline evaluates
    * offline: treat each event type as an arm, reward = 1 when the
    * event's value clears 50.0 (a Bernoulli-ized payoff in exact
    * integers), and score every arm with
    * `mean + sqrt(2·ln N / n_a)`. The mean is exact ppm integer
    * arithmetic (`rewards·10⁶ div n`); only the bonus touches
    * doubles — ONE fixed sqrt/ln tree snapped to e6 (the dqChi2
    * discipline) — and the "pull next" pick is the (ucb desc, arm
    * asc) argmin, deterministic without engine tie rules.
    *
    * Scale: one map-combinable per-arm aggregate; everything after
    * runs on the O(arms) frame. */
  def ucb1(s: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(s, dir)
      .groupBy(col("event_type").as("arm"))
      .agg(count(lit(1)).as("n_pulls"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L))
          .as("rewards"))
    val wAll = Window.partitionBy()
    val scored = arms
      .withColumn("n_total", sum(col("n_pulls")).over(wAll))
      .withColumn("mean_ppm",
        expr("(rewards * 1000000) div n_pulls"))
      .withColumn("bonus_ppm",
        floor(sqrt(lit(2.0) * log(col("n_total").cast(DoubleType))
          / col("n_pulls").cast(DoubleType)) * 1e6 + 0.5)
          .cast(LongType))
      .withColumn("ucb_ppm", col("mean_ppm") + col("bonus_ppm"))
    val wPick = Window.orderBy(col("ucb_ppm").desc, col("arm"))
    scored
      .withColumn("chosen", row_number().over(wPick) === 1)
      .select(col("arm"), col("n_pulls"), col("rewards"),
        col("mean_ppm"), col("bonus_ppm"), col("ucb_ppm"),
        col("chosen"))
      .orderBy(col("arm"))
  }

  val ucb1Sql: String =
    """WITH arms AS (
      |  SELECT event_type AS arm, COUNT(*) AS n_pulls,
      |    CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS rewards
      |  FROM events GROUP BY event_type),
      |scored AS (
      |  SELECT arm, n_pulls, rewards,
      |    (rewards * 1000000) // n_pulls AS mean_ppm,
      |    CAST(floor(sqrt(2.0 * ln(CAST(SUM(n_pulls) OVER ()
      |        AS DOUBLE)) / CAST(n_pulls AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS bonus_ppm
      |  FROM arms)
      |SELECT arm, n_pulls, rewards,
      |  CAST(mean_ppm AS BIGINT) AS mean_ppm, bonus_ppm,
      |  CAST(mean_ppm + bonus_ppm AS BIGINT) AS ucb_ppm,
      |  row_number() OVER (ORDER BY mean_ppm + bonus_ppm DESC, arm)
      |    = 1 AS chosen
      |FROM scored ORDER BY arm""".stripMargin

  /** Quantile regression by pinball-loss grid search (Koenker &
    * Bassett 1978's check loss, minimized over a deterministic
    * candidate grid instead of by simplex iteration): for τ = 0.9,
    * score 16 equi-spaced candidates between min and max order
    * price and emit each candidate's EXACT integer pinball loss
    * (cents, ×10 so the 0.9/0.1 weights stay integer:
    * `y>c → 9·(y−c), else 1·(c−y)`), with the argmin flagged
    * deterministically (loss asc, candidate asc). The winner
    * approximates the 0.9-quantile without any percentile kernel —
    * the form that generalizes to quantile LOSS over model
    * predictions.
    *
    * Scale: one min/max pass, then ONE map-side 16× conditional
    * expansion feeding a 16-group aggregate — map-combinable, no
    * corpus shuffle; the grid refines recursively at scale (each
    * round is the same single pass). */
  def quantileGrid(s: SparkSession, dir: String, tau10: Int = 9)
      : DataFrame = {
    val cents = Tables.orders(s, dir)
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("y"))
    val mm = cents.agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
    val wPick = Window.orderBy(col("loss10"), col("c_cents"))
    cents.crossJoin(broadcast(mm))
      .withColumn("i", explode(sequence(lit(1L), lit(16L))))
      .withColumn("c_cents",
        expr("mn + (i * (mx - mn)) div 16"))
      .groupBy(col("i"), col("c_cents"))
      .agg(sum(expr(s"CASE WHEN y > c_cents THEN $tau10 * (y - c_cents)" +
        s" ELSE ${10 - tau10} * (c_cents - y) END")).as("loss10"))
      .withColumn("is_argmin", row_number().over(wPick) === 1)
      .select(col("i"), col("c_cents"), col("loss10"), col("is_argmin"))
      .orderBy(col("i"))
  }

  val quantileGridSql: String =
    """WITH cents AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT) AS y
      |  FROM orders),
      |mm AS (SELECT MIN(y) AS mn, MAX(y) AS mx FROM cents),
      |grid AS (
      |  SELECT i, mn + (i * (mx - mn)) // 16 AS c_cents
      |  FROM mm, (SELECT unnest(range(1, 17)) AS i)),
      |losses AS (
      |  SELECT g.i, g.c_cents,
      |    CAST(SUM(CASE WHEN c.y > g.c_cents
      |      THEN 9 * (c.y - g.c_cents)
      |      ELSE 1 * (g.c_cents - c.y) END) AS BIGINT) AS loss10
      |  FROM grid g CROSS JOIN cents c
      |  GROUP BY g.i, g.c_cents)
      |SELECT CAST(i AS BIGINT) AS i, c_cents, loss10,
      |  row_number() OVER (ORDER BY loss10, c_cents) = 1 AS is_argmin
      |FROM losses ORDER BY i""".stripMargin

  /** Frozen-weights hashed-feature quality scorer (round-8 verdict
    * growth item b): the in-engine keep/drop pass a fastText-style
    * quality filter runs over a corpus (Joulin et al. 2016 — a linear
    * classifier over averaged hashed token features), composing the
    * two gated building blocks: [[featureHash]]'s portable polynomial
    * token hash (64 buckets, no vocabulary, no dictionary join —
    * Weinberger et al. 2009) and [[logregSteps]]' exact full-batch GD
    * step. Training is ONE logistic step from w = 0 on the proxy
    * label lang = 'en' (σ = 0.5 exactly, so the gradient has no
    * transcendental: w_b = −Σ x_b·(0.5−y) / (n·1e9) over 1e9-snapped
    * terms); SCORING then freezes those 64 weights and emits, per
    * document, the 1e12-snapped margin Σ_b w_b·tf_b/n_tok and the
    * keep verdict (margin > 0). Token-free docs score 0 → keep=false.
    *
    * Determinism: per-(doc,bucket) features are exact integer ratios
    * (tf/n_tok — one IEEE division), gradient and margin terms snap
    * to scaled longs BEFORE their commutative sums, and the weight is
    * one integer→double division — no libm anywhere (the sigmoid
    * never needs evaluating: keep ⟺ margin > 0).
    *
    * Scale: hashing is a per-token projection; tf and the gradient
    * are map-combinable groupBys; the model is 64 rows BROADCAST into
    * the scoring join; the margin is one more map-combinable groupBy;
    * the final all-docs left join is shuffle_hash-hinted (both sides
    * corpus-keyed by doc_id — not broadcastable by premise, and the
    * hash build avoids sorting the corpus). No shuffle carries
    * anything wider than (doc, bucket, counts). */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs
      .select(col("doc_id"),
        when(col("lang") === "en", -0.5).otherwise(0.5).as("gy"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok").rlike("^[a-z0-9]+$"))
    val tf = toks
      .withColumn("bucket", expr(
        "aggregate(transform(sequence(1, length(tok))," +
          " i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))," +
          " CAST(0 AS BIGINT)," +
          " (acc, x) -> (acc * 31 + x) % 1000000007) % 64"))
      .groupBy(col("doc_id"), col("gy"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val nt = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tok"))
    val xf = tf.join(nt, "doc_id")
      .select(col("doc_id"), col("gy"), col("bucket"), col("n_tok"),
        (col("tf").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("x"))
    val g = xf.groupBy(col("bucket"))
      .agg(sum(floor(col("x") * col("gy") * 1e9 + 0.5)
        .cast(LongType)).as("g9"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = g.crossJoin(broadcast(n))
      .select(col("bucket"),
        (-(col("g9").cast(DoubleType) /
          (col("n").cast(DoubleType) * 1e9))).as("w"))
    val sc = xf.join(broadcast(w), "bucket")
      .groupBy(col("doc_id"))
      .agg(min(col("n_tok")).as("n_tok"),
        sum(floor(col("w") * col("x") * 1e12 + 0.5).cast(LongType))
          .as("score_e12"))
    docs.select(col("doc_id"))
      .hint("shuffle_hash")
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("score_e12"), lit(0L)).as("score_e12"),
        (coalesce(col("score_e12"), lit(0L)) > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN lang = 'en' THEN CAST(-0.5 AS DOUBLE)
      |         ELSE CAST(0.5 AS DOUBLE) END AS gy,
      |    unnest(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      t -> regexp_matches(t, '^[a-z0-9]+$'))) AS tok
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, gy,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(tok)),
      |        i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket
      |  FROM toks),
      |tf AS (
      |  SELECT doc_id, gy, bucket, COUNT(*) AS tf
      |  FROM h GROUP BY doc_id, gy, bucket),
      |nt AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok
      |  FROM tf GROUP BY doc_id),
      |xf AS (
      |  SELECT t.doc_id, t.gy, t.bucket, n.n_tok,
      |    CAST(t.tf AS DOUBLE) / CAST(n.n_tok AS DOUBLE) AS x
      |  FROM tf t JOIN nt n USING (doc_id)),
      |g AS (
      |  SELECT bucket,
      |    CAST(SUM(CAST(floor(x * gy * 1e9 + 0.5) AS BIGINT))
      |      AS BIGINT) AS g9
      |  FROM xf GROUP BY bucket),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |w AS (
      |  SELECT bucket,
      |    -(CAST(g9 AS DOUBLE) / (CAST(nn.n AS DOUBLE) * 1e9)) AS w
      |  FROM g, nn),
      |sc AS (
      |  SELECT xf.doc_id, MIN(xf.n_tok) AS n_tok,
      |    CAST(SUM(CAST(floor(w.w * xf.x * 1e12 + 0.5) AS BIGINT))
      |      AS BIGINT) AS score_e12
      |  FROM xf JOIN w USING (bucket)
      |  GROUP BY xf.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(sc.n_tok, 0) AS BIGINT) AS n_tok,
      |  CAST(COALESCE(sc.score_e12, 0) AS BIGINT) AS score_e12,
      |  COALESCE(sc.score_e12, 0) > 0 AS keep
      |FROM documents d LEFT JOIN sc USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** The OLS figures of [[conformal]] as shared SQL-text fragments
    * over the train split's double power sums — pasted verbatim into
    * BOTH engines' plans (the [[linreg]]/granger determinism idiom),
    * so the per-row residual trees are identical by construction. */
  private val confSlope: String =
    "((tn*sxy - sx*sy) / (tn*sxx - sx*sx))"
  private val confIcept: String =
    s"((sy - $confSlope * sx) / tn)"

  /** Split-conformal prediction interval (Vovk et al. 2005;
    * Papadopoulos et al. 2002; Lei et al., JASA 2018) for the
    * [[linreg]] price~quantity model — the DISTRIBUTION-FREE
    * uncertainty wrapper an eval pipeline puts around any point
    * predictor: fit on the train split (even l_orderkey), take the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual on the DISJOINT
    * calibration split (odd keys, α = 0.1), and ŷ ± q covers with
    * probability ≥ 90% by exchangeability alone — no Gaussian
    * assumption. Emits the model, the interval half-width q, and the
    * finite-sample calibration coverage the guarantee implies.
    *
    * Determinism: power sums are exact decimals cast to double once;
    * slope/intercept/residuals are fixed shared-text double trees;
    * each |residual| snaps to cents BEFORE ranking; the conformal
    * rank ⌈0.9·(n+1)⌉ is exact integer arithmetic and the quantile
    * is a conditional MIN over the residual histogram — the
    * percentile_disc discipline, never a global row sort.
    *
    * Scale: one power-sum pass over train, one residual pass over
    * calibration, a window over O(distinct cent values); everything
    * after is scalar. */
  def conformal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    import org.apache.spark.sql.expressions.Window
    val li = graft.Tables.lineitem(s, dir)
      .select((col("l_orderkey") % 2 === 0).as("train"),
        col("l_quantity").cast(DecimalType(18, 2)).as("x"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
    val sums = li.filter(col("train")).agg(
        count(lit(1)).cast(DoubleType).as("tn"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxy"))
    val resid = li.filter(!col("train"))
      .crossJoin(broadcast(sums))
      .withColumn("r_e2", expr(
        s"CAST(floor(abs(CAST(y AS DOUBLE) - ($confIcept" +
          s" + $confSlope * CAST(x AS DOUBLE))) * 100.0 + 0.5)" +
          " AS BIGINT)"))
      .select(col("r_e2"))
      .localCheckpoint() // three consumers: count, histogram, coverage
    val nCal = resid.agg(count(lit(1)).as("n_cal"))
    val wOrd = Window.orderBy(col("v")) // O(distinct cent residuals)
    val q = resid.groupBy(col("r_e2").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(nCal))
      // conformal rank k = ⌈0.9·(n+1)⌉ = (9·(n+1) + 9) div 10
      .filter(col("cum") * 10 >= (col("n_cal") + 1) * 9)
      .agg(min(col("v")).as("q_e2"))
    val cov = resid.crossJoin(broadcast(q))
      .agg(sum(when(col("r_e2") <= col("q_e2"), 1L).otherwise(0L))
        .as("covered"))
    sums.crossJoin(broadcast(nCal)).crossJoin(broadcast(q))
      .crossJoin(broadcast(cov))
      .select(col("tn").cast(LongType).as("n_train"), col("n_cal"),
        expr(s"CAST(floor($confSlope * 1e6 + 0.5) AS BIGINT)")
          .as("slope_e6"),
        expr(s"CAST(floor($confIcept * 100.0 + 0.5) AS BIGINT)")
          .as("intercept_e2"),
        col("q_e2"),
        expr("(covered * 1000000) div n_cal").as("cov_ppm"))
  }

  val conformalSql: String = {
    s"""WITH li AS (
      |  SELECT l_orderkey % 2 = 0 AS train,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS tn,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy
      |  FROM li WHERE train),
      |resid AS (
      |  SELECT CAST(floor(abs(CAST(y AS DOUBLE) - ($confIcept
      |      + $confSlope * CAST(x AS DOUBLE))) * 100.0 + 0.5)
      |      AS BIGINT) AS r_e2
      |  FROM li, sums WHERE NOT train),
      |ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM resid),
      |cum AS (
      |  SELECT v, SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM (SELECT r_e2 AS v, COUNT(*) AS c FROM resid GROUP BY 1)),
      |q AS (SELECT MIN(v) AS q_e2 FROM cum, ncal
      |      WHERE cum * 10 >= (n_cal + 1) * 9),
      |cov AS (
      |  SELECT CAST(SUM(CASE WHEN r_e2 <= q_e2 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS covered
      |  FROM resid, q)
      |SELECT CAST(tn AS BIGINT) AS n_train, n_cal,
      |  CAST(floor($confSlope * 1e6 + 0.5) AS BIGINT) AS slope_e6,
      |  CAST(floor($confIcept * 100.0 + 0.5) AS BIGINT)
      |    AS intercept_e2,
      |  q_e2, (covered * 1000000) // n_cal AS cov_ppm
      |FROM sums, ncal, q, cov""".stripMargin
  }

  /** The LMG figures as shared SQL-text fragments over the nine
    * double power sums — pasted verbatim into BOTH engines. Centered
    * moments in n-scaled form (n·Σxy − Σx·Σy) so no mean divides
    * early. */
  private val lmgV1 = "(n*sxx1 - sx1*sx1)"
  private val lmgV2 = "(n*sxx2 - sx2*sx2)"
  private val lmgVy = "(n*syy - sy*sy)"
  private val lmgC12 = "(n*sx12 - sx1*sx2)"
  private val lmgC1y = "(n*sx1y - sx1*sy)"
  private val lmgC2y = "(n*sx2y - sx2*sy)"
  private val lmgR1 = s"(($lmgC1y*$lmgC1y) / ($lmgV1*$lmgVy))"
  private val lmgR2 = s"(($lmgC2y*$lmgC2y) / ($lmgV2*$lmgVy))"
  private val lmgR12 =
    s"(($lmgC1y*($lmgC1y*$lmgV2 - $lmgC2y*$lmgC12)" +
      s" + $lmgC2y*($lmgC2y*$lmgV1 - $lmgC1y*$lmgC12))" +
      s" / (($lmgV1*$lmgV2 - $lmgC12*$lmgC12)*$lmgVy))"

  /** LMG relative importance (Lindeman–Merenda–Gold 1980; Grömping,
    * "Relative Importance for Linear Regression in R", JSS 2006) —
    * the Shapley decomposition of R² over regressors: each feature's
    * share is its incremental R² averaged over all orderings. For
    * the two-regressor price ~ quantity + discount model this is
    * CLOSED FORM over the same nine power sums [[ridge]] collects:
    * LMG₁ = (R²{1} + R²{12} − R²{2})/2, symmetric for 2, and
    * LMG₁ + LMG₂ = R²{12} exactly — the additivity that makes it a
    * Shapley value (the spec pins it). All three R² terms are
    * shared-text double trees over n-scaled centered moments,
    * e6-snapped.
    *
    * Scale: one map-combinable power-sum pass; everything after is
    * one row. */
  def lmgImportance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d = graft.Tables.lineitem(s, dir)
      .select(col("l_quantity").cast(DecimalType(18, 2)).as("x1"),
        col("l_discount").cast(DecimalType(18, 2)).as("x2"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
    d.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("x1")).cast(DoubleType).as("sx1"),
        sum(col("x2")).cast(DoubleType).as("sx2"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum((col("x1") * col("x1")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxx1"),
        sum((col("x1") * col("x2")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx12"),
        sum((col("x2") * col("x2")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sxx2"),
        sum((col("x1") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx1y"),
        sum((col("x2") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("sx2y"),
        sum((col("y") * col("y")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as("syy"))
      .selectExpr("CAST(n AS BIGINT) AS n",
        s"CAST(floor($lmgR1 * 1e6 + 0.5) AS BIGINT) AS r2_x1_e6",
        s"CAST(floor($lmgR2 * 1e6 + 0.5) AS BIGINT) AS r2_x2_e6",
        s"CAST(floor($lmgR12 * 1e6 + 0.5) AS BIGINT) AS r2_both_e6",
        s"CAST(floor(($lmgR1 + $lmgR12 - $lmgR2) / 2.0 * 1e6 + 0.5)" +
          " AS BIGINT) AS lmg_x1_e6",
        s"CAST(floor(($lmgR2 + $lmgR12 - $lmgR1) / 2.0 * 1e6 + 0.5)" +
          " AS BIGINT) AS lmg_x2_e6")
  }

  val lmgImportanceSql: String =
    s"""WITH d AS (
      |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
      |    CAST(l_discount AS DECIMAL(18,2)) AS x2,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(x1) AS DOUBLE) AS sx1,
      |    CAST(SUM(x2) AS DOUBLE) AS sx2,
      |    CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,4))) AS DOUBLE) AS sxx1,
      |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS sx12,
      |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS sxx2,
      |    CAST(SUM(CAST(x1 * y AS DECIMAL(38,4))) AS DOUBLE) AS sx1y,
      |    CAST(SUM(CAST(x2 * y AS DECIMAL(38,4))) AS DOUBLE) AS sx2y,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
      |  FROM d)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST(floor($lmgR1 * 1e6 + 0.5) AS BIGINT) AS r2_x1_e6,
      |  CAST(floor($lmgR2 * 1e6 + 0.5) AS BIGINT) AS r2_x2_e6,
      |  CAST(floor($lmgR12 * 1e6 + 0.5) AS BIGINT) AS r2_both_e6,
      |  CAST(floor(($lmgR1 + $lmgR12 - $lmgR2) / 2.0 * 1e6 + 0.5)
      |    AS BIGINT) AS lmg_x1_e6,
      |  CAST(floor(($lmgR2 + $lmgR12 - $lmgR1) / 2.0 * 1e6 + 0.5)
      |    AS BIGINT) AS lmg_x2_e6
      |FROM sums""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "learn_conformal" -> (conformal _),
    "learn_lmg_importance" -> (lmgImportance _),
    "learn_quality_score" -> (qualityScore _),
    "learn_quantile_grid" ->
      ((s: SparkSession, d: String) => quantileGrid(s, d)),
    "learn_ucb1" -> (ucb1 _),
    "learn_svm_step" -> (svmSteps _),
    "learn_anova_f" -> (anovaF _),
    "learn_target_encode" -> (targetEncode _),
    "learn_feature_hash" -> (featureHash _),
    "learn_woe_iv" -> ((s: SparkSession, d: String) => woeIv(s, d)),
    "learn_gbdt_round" -> ((s: SparkSession, d: String) =>
      gbdtRound(s, d)),
    "learn_tree_depth2" -> ((s: SparkSession, d: String) =>
      treeDepth2(s, d)),
    "learn_stump" -> ((s: SparkSession, d: String) => stump(s, d)),
    "learn_logreg_steps" -> (logregSteps _),
    "learn_kfold" -> ((s, d) => kfold(s, d)),
    "learn_naive_bayes" -> (naiveBayes _),
    "learn_linreg" -> (linreg _),
    "learn_ridge" -> (ridge _))

  def oracle: Map[String, String] = Map(
    "learn_conformal" -> conformalSql,
    "learn_lmg_importance" -> lmgImportanceSql,
    "learn_quality_score" -> qualityScoreSql,
    "learn_quantile_grid" -> quantileGridSql,
    "learn_ucb1" -> ucb1Sql,
    "learn_svm_step" -> svmSql,
    "learn_anova_f" -> anovaFSql,
    "learn_target_encode" -> targetEncodeSql,
    "learn_feature_hash" -> featureHashSql,
    "learn_woe_iv" -> woeIvSql,
    "learn_gbdt_round" -> gbdtRoundSql,
    "learn_tree_depth2" -> treeDepth2Sql,
    "learn_stump" -> stumpSql,
    "learn_logreg_steps" -> logregSql,
    "learn_kfold" -> kfoldSql,
    "learn_naive_bayes" -> naiveBayesSql,
    "learn_linreg" -> linregSql,
    "learn_ridge" -> ridgeSql)
}
