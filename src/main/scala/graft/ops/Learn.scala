package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "learn_logreg_steps" -> (logregSteps _),
    "learn_linreg" -> (linreg _))

  def oracle: Map[String, String] = Map(
    "learn_logreg_steps" -> logregSql,
    "learn_linreg" -> linregSql)
}
