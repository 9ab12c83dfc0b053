package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.plans.GramUpper

/** Spectral / moment-matrix operators over the embeddings corpus:
  * one-pass Gram matrix and power-iteration PCA — the linear-algebra
  * layer under whitening, PCA dedup projections, and spectral
  * diagnostics of an embedding space.
  *
  * Scale design: the ONLY corpus-wide pass is the [[GramUpper]]
  * aggregation, whose shuffle carries one d(d+1)/2-long partial per
  * partition (16 KiB at d = 64) — never n·d² exploded products. Every
  * downstream step (symmetrization, power iterations, normalization)
  * runs on the d×d matrix frame: metadata-sized at any corpus size.
  *
  * Determinism: components quantize to 1e-3-scaled longs
  * (`floor(x·1000 + 0.5)` — identical IEEE ops cross-engine), so Gram
  * entries are exact BIGINTs. Power-iteration normalization divides
  * two exactly-representable BIGINTs (< 2⁵³) in double and re-snaps to
  * a ±10⁴-bounded long per round — one fixed-shape float expression,
  * the Mining-lift discipline. Iterate-then-snap magnitudes: with
  * |q| ≤ 10³ the y-vector stays under 2⁵³ through d = 64, n ≤ 5·10⁴;
  * beyond that the quantizer drops to 1e-2 or the matvec widens to
  * DECIMAL — the plan shape is unchanged.
  */
object Spectral {

  /** (vec_id, i, qv): 1-based component index, 1e-3-quantized long. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast(LongType).as("i"),
        floor(col("col").cast(DoubleType) * 1000.0 + 0.5)
          .cast(LongType).as("qv"))

  private def dim(s: SparkSession, dir: String): Int =
    Tables.embeddings(s, dir)
      .select(size(col("embedding"))).head().getInt(0)

  /** Upper-triangle Gram matrix G[i][j] = Σ_v q_i·q_j (1-based,
    * i ≤ j) as exact BIGINTs — one [[GramUpper]] pass. */
  def gramMatrix(s: SparkSession, dir: String): DataFrame = {
    val d = dim(s, dir)
    import s.implicits._
    val qvecs = Tables.embeddings(s, dir)
      .select(transform(col("embedding"), x =>
        floor(x.cast(DoubleType) * 1000.0 + 0.5).cast(LongType)).as("q"))
      .as[Seq[Long]]
    val flat = qvecs.select(GramUpper(d).toColumn).toDF("g")
      .select(posexplode(col("g")))
    // upper-triangle index → (i, j): idx = Σ_{r<i}(d−r) + (j−i),
    // inverted per row by a join against the static index map — d²/2
    // rows of metadata, broadcast.
    val idx = (0 until d).flatMap(i => (i until d).map(j => (i, j)))
      .zipWithIndex.map { case ((i, j), k) =>
        (k, (i + 1).toLong, (j + 1).toLong)
      }
    val idxDf = s.createDataFrame(idx).toDF("pos", "i", "j")
    flat.join(broadcast(idxDf), "pos")
      .select(col("i"), col("j"), col("col").as("g"))
      .orderBy(col("i"), col("j"))
  }

  val gramMatrixSql: String =
    """WITH q AS (
      |  SELECT vec_id, CAST(i AS BIGINT) AS i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
      |      AS BIGINT) AS qv
      |  FROM embeddings,
      |    unnest(generate_series(1, len(embedding))) AS u(i))
      |SELECT a.i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS g
      |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |GROUP BY a.i, b.i
      |ORDER BY 1, 2""".stripMargin

  /** Dominant-eigenvector estimate by `iters` power-iteration rounds
    * over [[gramMatrix]], all arithmetic replayable: y = G·x is an
    * exact BIGINT matvec on the d×d frame, then x ← floor(y/max|y|
    * ·10⁴ + 0.5) re-normalizes to ±10⁴ via one double division of
    * < 2⁵³ integers. Deterministic all-ones start; emits the final
    * (i, x) direction. The oracle replays the identical recurrence
    * (the PageRank-gate pattern), so truncated-iteration outputs
    * can't silently drift. */
  def pcaPower(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    // The Gram matrix IS the model: d(d+1)/2 longs (2080 at d = 64)
    // regardless of corpus size — the same metadata-collect contract
    // as the CMS sketch and the Markov ppm chain, and iterating a
    // 64-vector against it driver-side costs microseconds where the
    // DataFrame formulation pays 2·iters jobs of scheduler latency.
    // The corpus-scale work (the one-pass Gram aggregation) stays
    // fully distributed inside [[gramMatrix]].
    val upper = gramMatrix(s, dir).collect()
    val d = upper.iterator.map(_.getLong(1)).max.toInt
    val g = Array.ofDim[Long](d, d)
    upper.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1,
        r.getLong(2))
      g(i)(j) = v
      g(j)(i) = v
    }
    var x = Array.fill(d)(10000L)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += g(i)(j) * x(j); j += 1 }
        acc
      }
      val m = y.iterator.map(math.abs).max
      x = y.map(v =>
        math.floor(v.toDouble / m.toDouble * 10000.0 + 0.5).toLong)
    }
    import s.implicits._
    x.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toSeq
      .toDF("i", "x").orderBy(col("i"))
  }

  def pcaPowerSql(iters: Int = 4): String = {
    val steps = (1 to iters).map { k =>
      s"""y$k AS (
         |  SELECT g.i, CAST(SUM(g.g * x${k - 1}.x) AS BIGINT) AS y
         |  FROM g JOIN x${k - 1} ON g.j = x${k - 1}.j GROUP BY g.i),
         |m$k AS (SELECT MAX(ABS(y)) AS m FROM y$k),
         |x$k AS (
         |  SELECT i AS j,
         |    CAST(floor(CAST(y AS DOUBLE) / CAST(m AS DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT) AS x
         |  FROM y$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
       |      AS BIGINT) AS qv
       |  FROM embeddings,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |g AS (
       |  SELECT a.i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS g
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i),
       |x0 AS (
       |  SELECT DISTINCT i AS j, CAST(10000 AS BIGINT) AS x FROM g),
       |$steps
       |SELECT j AS i, x FROM x$iters ORDER BY i""".stripMargin
  }

  /** All-but-the-top diagnostic (Mu & Viswanath, "All-but-the-Top:
    * Simple and Effective Postprocessing for Word Representations",
    * ICLR 2018): embeddings share a large common component; centering
    * and projecting out the top principal direction measurably
    * improves similarity tasks. This gate computes, per vector, the
    * projection onto the dominant CENTERED principal direction and
    * the share of the vector's centered energy that direction
    * explains — the before/after evidence for applying the
    * postprocess.
    *
    * Exactness: the centered Gram is formed without ever dividing by
    * n — `n·G − S·Sᵀ` (S = per-dim component sums) is an exact BIGINT
    * matrix with the same eigenvectors as the covariance; the power
    * iteration replays [[pcaPower]]'s integer recurrence on it.
    * Per-vector n-scaled centered components `c_i = n·q_i − S_i` are
    * exact longs, so the projection t = ⟨c, v⟩ and energy c² = ⟨c, c⟩
    * are exact (no i64 overflow through n = 10⁵ at d = 64, |q| ≤ 10³;
    * the centered Gram is additionally floor-div rescaled ×1e-3 so
    * the matvec holds the same bound); the emitted share
    * t²/(c²·‖v‖²) is ONE fixed-shape double tree, 1e6-snapped —
    * long→double casts round identically in both engines, so
    * exceeding 2⁵³ only loses resolution, never cross-engine
    * agreement.
    *
    * Scale: corpus passes are the one [[GramUpper]] aggregation +
    * one per-dim sum + the final per-vector projection — a pure
    * codegen HOF projection with v and S broadcast as literals;
    * everything between runs on d×d metadata driver-side. */
  def abtt(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val upper = gramMatrix(s, dir).collect()
    val d = upper.iterator.map(_.getLong(1)).max.toInt
    val sums = quantized(s, dir).groupBy(col("i"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0).toInt - 1, r.getLong(1),
        r.getLong(2)))
    val n = sums.head._3
    val sArr = Array.ofDim[Long](d)
    sums.foreach { case (i, v, _) => sArr(i) = v }
    val gc = Array.ofDim[Long](d, d)
    upper.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1,
        r.getLong(2))
      // Integer rescale (×1e-3) keeps the matvec under 2⁶³ through
      // n = 10⁵ (eigenvectors are scale-invariant). The entries are
      // signed, so the division is SIGN-PEELED on both sides — the
      // engines' native integer divisions disagree on negatives.
      val raw = n * v - sArr(i) * sArr(j)
      val c = if (raw < 0) -((-raw) / 1000L) else raw / 1000L
      gc(i)(j) = c
      gc(j)(i) = c
    }
    var x = Array.fill(d)(10000L)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += gc(i)(j) * x(j); j += 1 }
        acc
      }
      val m = y.iterator.map(math.abs).max
      x = y.map(v =>
        math.floor(v.toDouble / m.toDouble * 10000.0 + 0.5).toLong)
    }
    val v2 = x.map(v => v * v).sum
    val vLit = array(x.map(lit(_)): _*)
    val sLit = array(sArr.map(lit(_)): _*)
    val qarr = transform(col("embedding"), e =>
      floor(e.cast(DoubleType) * 1000.0 + 0.5).cast(LongType))
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        zip_with(qarr, sLit, (q, sv) => lit(n) * q - sv).as("c"))
      .select(col("vec_id"),
        aggregate(zip_with(col("c"), vLit, (c, v) => c * v),
          lit(0L), (a, t) => a + t).as("proj_t"),
        aggregate(transform(col("c"), c => c * c),
          lit(0L), (a, t) => a + t).as("c2"))
      .select(col("vec_id"), col("proj_t"),
        when(col("c2") === 0L, 0L).otherwise(
          floor(col("proj_t").cast(DoubleType)
            * col("proj_t").cast(DoubleType)
            / (col("c2").cast(DoubleType) * lit(v2).cast(DoubleType))
            * 1000000.0 + 0.5).cast(LongType)).as("top_share_ppm"))
      .orderBy(col("vec_id"))
  }

  def abttSql(iters: Int = 4): String = {
    val steps = (1 to iters).map { k =>
      s"""y$k AS (
         |  SELECT gc.i, CAST(SUM(gc.g * x${k - 1}.x) AS BIGINT) AS y
         |  FROM gc JOIN x${k - 1} ON gc.j = x${k - 1}.j GROUP BY gc.i),
         |m$k AS (SELECT MAX(ABS(y)) AS m FROM y$k),
         |x$k AS (
         |  SELECT i AS j,
         |    CAST(floor(CAST(y AS DOUBLE) / CAST(m AS DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT) AS x
         |  FROM y$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5)
       |      AS BIGINT) AS qv
       |  FROM embeddings,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |sums AS (SELECT i, CAST(SUM(qv) AS BIGINT) AS s
       |         FROM q GROUP BY i),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
       |g AS (
       |  SELECT a.i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS g
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i),
       |gc AS (
       |  SELECT g.i, g.j,
       |    CAST(CASE WHEN nn.n * g.g - sa.s * sb.s < 0
       |      THEN -((-(nn.n * g.g - sa.s * sb.s)) // 1000)
       |      ELSE (nn.n * g.g - sa.s * sb.s) // 1000 END
       |      AS BIGINT) AS g
       |  FROM g CROSS JOIN nn
       |  JOIN sums sa ON sa.i = g.i JOIN sums sb ON sb.i = g.j),
       |x0 AS (
       |  SELECT DISTINCT i AS j, CAST(10000 AS BIGINT) AS x FROM gc),
       |$steps,
       |v2 AS (SELECT CAST(SUM(x * x) AS BIGINT) AS v2 FROM x$iters),
       |c AS (
       |  SELECT q.vec_id, q.i,
       |    CAST(nn.n * q.qv - sums.s AS BIGINT) AS c
       |  FROM q CROSS JOIN nn JOIN sums ON sums.i = q.i),
       |pv AS (
       |  SELECT c.vec_id, CAST(SUM(c.c * x$iters.x) AS BIGINT) AS t,
       |    CAST(SUM(c.c * c.c) AS BIGINT) AS c2
       |  FROM c JOIN x$iters ON x$iters.j = c.i GROUP BY c.vec_id)
       |SELECT vec_id, t AS proj_t,
       |  CASE WHEN c2 = 0 THEN 0 ELSE
       |    CAST(floor(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
       |      / (CAST(c2 AS DOUBLE) * CAST(v2 AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) END AS top_share_ppm
       |FROM pv, v2 ORDER BY vec_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_gram_matrix" -> (gramMatrix _),
    "embed_abtt" -> ((s: SparkSession, d: String) => abtt(s, d)),
    "embed_pca_power" -> ((s: SparkSession, d: String) =>
      pcaPower(s, d)))

  def oracle: Map[String, String] = Map(
    "embed_gram_matrix" -> gramMatrixSql,
    "embed_abtt" -> abttSql(),
    "embed_pca_power" -> pcaPowerSql())
}
