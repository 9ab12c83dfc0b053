package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Time-series regularization: resample an irregular event stream
  * onto a fixed grid (the "spine") and forward-fill gaps with the
  * last observation.
  *
  * Scale: the spine is `users × grid` — generated, not shuffled
  * (a `sequence` + `explode` on the dimension side), so the only
  * shuffles are the hourly pre-aggregation and the per-user window
  * for the fill, both keyed on user_id and reusable. The fill itself
  * is `last(ignoreNulls)` over a running row frame — one pass, no
  * self-join (the naive "join each gap to its predecessor" plan is a
  * range self-join that explodes at scale).
  */
object TimeSeries {

  /** Hourly resample + forward fill. `gridStart`/`gridEnd` bound the
    * spine (at scale: from table stats, or a calendar dimension). */
  def resampleFfill(events: DataFrame, gridStart: String, gridEnd: String)
      : DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
        .as("v"))
    // Derive the user dimension from the (already tiny) hourly
    // aggregate, not a second full scan of the event stream — at
    // 100 TB the raw table is the expensive thing to touch twice.
    // Exchange discipline: everything downstream is per-user, so ONE
    // hash(user_id) re-clustering of the (already map-side-combined,
    // users×hours-sized) hourly aggregate serves the whole tail. The
    // user dimension is the first hourly row per user (a row_number
    // window INSIDE the exchange — not a distinct, which would plan
    // its own exchange over a second scan of the raw events); the
    // spine explode preserves the partitioning; and the spine↔hourly
    // join is a merge-hinted self-reuse of that SAME exchange —
    // hash(user_id) is a subset of the join keys, so it satisfies the
    // join's ClusteredDistribution and BOTH sides plan as
    // ReusedExchange with intra-partition sorts only. The grid-sized
    // (720×users) frame is never exchanged, the SMJ's (user_id, h)
    // order feeds the fill window with no re-sort, and a per-user
    // rollup on top aggregates exchange-free. The clustered hourly
    // frame is cached (MEMORY_AND_DISK, users×hours rows — the
    // aggregate, never the raw events) because column pruning would
    // otherwise specialize the spine branch into a second full scan
    // of the event table, defeating subtree reuse.
    val clustered = hourly.repartition(col("user_id")).cache()
    // User dimension via distinct over the CACHED clustered frame —
    // the cache is what keeps this from re-scanning the raw events
    // (the concern the old row_number form addressed), and distinct
    // is a hash aggregate on the standing hash(user_id) clustering:
    // no per-user sort of the whole hourly frame just to keep one
    // row per user (measured −0.5 s on the interpolate twin this
    // round). Identical user set.
    val spine = clustered
      .select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(
          lit(gridStart).cast(TimestampType),
          lit(gridEnd).cast(TimestampType),
          expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(clustered.hint("merge"), Seq("user_id", "h"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
  }

  // -------------------------------------------------------------- //

  /** Gate: resample the events table onto its (fixture-fixed) January
    * 2024 hourly grid, forward-fill, and roll up per user: grid size,
    * number of gap-filled hours, and the decimal-exact total of the
    * filled series. The oracle rebuilds the same spine with
    * generate_series + IGNORE NULLS window in DuckDB. */
  def tsResample(s: SparkSession, dir: String): DataFrame =
    resampleFfill(Tables.events(s, dir),
        "2024-01-01 00:00:00", "2024-01-30 23:00:00")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(when(col("v").isNull && col("fv").isNotNull, 1L).otherwise(0L))
          .as("n_filled"),
        sum(col("fv").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total"))
      .orderBy(col("user_id"))

  val tsResampleSql: String =
    """WITH hours AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h),
      |users AS (SELECT DISTINCT user_id FROM events),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT u.user_id, hours.h FROM users u CROSS JOIN hours),
      |filled AS (
      |  SELECT s.user_id, s.h, hourly.v,
      |    last_value(hourly.v IGNORE NULLS) OVER (
      |      PARTITION BY s.user_id ORDER BY s.h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      |  FROM spine s LEFT JOIN hourly
      |    ON s.user_id = hourly.user_id AND s.h = hourly.h)
      |SELECT user_id, COUNT(*) AS n_hours,
      |  CAST(SUM(CASE WHEN v IS NULL AND fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |  CAST(SUM(CAST(fv AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM filled
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- //

  /** Batch sessionization: split each user's event stream into
    * sessions at idle gaps > `gapSec` (the batch analog of
    * `EventStreams`' `session_window`, for the backfill/replay case
    * where the data is already at rest).
    *
    * Scale: one hash shuffle on user_id feeds BOTH windows (lag for
    * the boundary flag, running sum for the session index) — Spark
    * reuses the single Exchange because the partitioning and ordering
    * match; the final per-session aggregate is a partial-agg groupBy
    * on the same key. No spine, no self-join, no global window.
    */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // Micros-exact gap (timestamps carry sub-second precision; a
    // seconds cast would truncate and disagree with the oracle at
    // the boundary).
    events
      .withColumn("_gap",
        unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_new")).over(running))
  }

  /** Gate: 30-minute-gap sessions per user over `events`, rolled up
    * to (user, session) with span, size, and decimal-exact value sum.
    */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir), gapSec = 1800L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"))
      .orderBy(col("user_id"), col("session_idx"))

  val sessionizeBatchSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
      |              > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_idx
      |  FROM flagged)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM sessions
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** Ordered funnel analysis (view → click → purchase): stage k
    * counts users whose FIRST stage-k event strictly follows their
    * entry into stage k-1 — the standard first-touch funnel. Three
    * map-combinable min-aggregates chained by equi-joins on user_id;
    * each stage's input is type-filtered at the scan (pushdown), so
    * at 100 TB every stage reads only its event type's row group
    * stripes and shuffles one (user, ts) pair per qualifying user.
    * Timestamp comparisons are micros-exact on both engines (see
    * [[graft.Tables.events]] nanos truncation). */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(label).as("stage"), col("users"))
    stage(t1, "1_view").unionAll(stage(t2, "2_click"))
      .unionAll(stage(t3, "3_purchase"))
      .orderBy(col("stage"))
  }

  val funnelSql: String =
    """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |       JOIN t1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > t1.t1
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |       JOIN t2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |       GROUP BY e.user_id)
      |SELECT '1_view' AS stage, COUNT(*) AS users FROM t1
      |UNION ALL SELECT '2_click', COUNT(*) FROM t2
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM t3
      |ORDER BY stage""".stripMargin

  /** Per-user behavior corpus: the event sequence ordered by
    * (ts, event_id) rendered two ways — `beh`, the event-type-initial
    * string edit distance scores on (one char per event, so
    * `levenshtein` counts SEQUENCE edits), and `beh_words`, the
    * space-joined full event-type names the shingle/LSH machinery
    * buckets on (tokens = events, so word n-grams = event n-grams,
    * over the real event-type vocabulary). One groupBy, one sorted
    * collect; both renderings derive from the same array. */
  def behaviorCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
          col("ts"), col("event_id"), col("event_type").as("t"))))
        .as("seq"))
      .select(col("user_id"),
        array_join(transform(col("seq"),
          p => substring(p("t"), 1, 1)), "").as("beh"),
        array_join(transform(col("seq"), p => p("t")), " ")
          .as("beh_words"))

  /** Behavioral-sequence similarity (the trajectory-similarity
    * modality — REPOSE/ICDE'21 family): each user's event-type
    * sequence, ordered by (ts, event_id), becomes a string; the k
    * most-similar users are ranked by EDIT distance, which respects
    * order and insertions the way bag-of-events cosine cannot
    * (signup→view→purchase is NOT purchase→view→signup). Exact
    * all-pairs `levenshtein` here (bounded: one row per user, the
    * oracle-checkable baseline); the 100 TB path is
    * [[behaviorTopKLshOver]], which draws candidates from
    * [[Dedup.minhashLshPairs]] buckets and never broadcasts or
    * cross-joins the corpus. */
  def behaviorTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val beh = behaviorCorpus(s, dir).select(col("user_id"), col("beh"))
    // bounded query side (user_id < 50) — the same convention as the
    // vector top-k baselines: the exact all-pairs pass is the ORACLE
    // baseline, not the scale path, so its quadratic term is pinned
    val a = beh.filter(col("user_id") < 50)
      .toDF("user_a", "beh_a").repartition(par)
    val b = broadcast(beh.toDF("user_b", "beh_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_a")).orderBy(col("dist"), col("user_b"))
    a.crossJoin(b).filter(col("user_a") =!= col("user_b"))
      .withColumn("dist", levenshtein(col("beh_a"), col("beh_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user_a"), col("user_b"),
        col("rank").cast("long").as("rank"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("user_a"), col("rank"))
  }

  val behaviorTopKSql: String =
    """WITH beh AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
      |      AS beh
      |  FROM events GROUP BY user_id),
      |p AS (
      |  SELECT a.user_id AS user_a, b.user_id AS user_b,
      |    levenshtein(a.beh, b.beh) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY a.user_id
      |      ORDER BY levenshtein(a.beh, b.beh), b.user_id) AS rank
      |  FROM beh a, beh b
      |  WHERE a.user_id < 50 AND a.user_id <> b.user_id)
      |SELECT user_a, user_b, CAST(rank AS BIGINT) AS rank,
      |  CAST(dist AS BIGINT) AS dist
      |FROM p WHERE rank <= 3
      |ORDER BY user_a, rank""".stripMargin

  /** SCALE path for behavior similarity: candidates come from
    * [[Dedup.minhashLshCandidates]] buckets over the `beh_words`
    * rendering (word 3-grams = event trigrams), and `levenshtein`
    * scores ONLY inside candidate buckets — the same bucket-then-
    * verify discipline as the document dedup scale paths, applied to
    * the behavioral modality. The band geometry is 16×2 (not the
    * dedup default 8×4): top-k retrieval must surface MID-similarity
    * neighbors, so the collision S-curve is pulled left, trading more
    * candidates for recall — the standard LSH tuning axis.
    *
    * No corpus broadcast, no cross join anywhere: the band/bucket
    * self-join and every re-join of the behavior strings are keyed
    * equi-joins, so at 100× users the shuffles carry (user_id, band,
    * bucket) keys and candidate id pairs, never the full behavior
    * table (the quadratic exact pass in [[behaviorTopK]] stays what it
    * is — the bounded oracle baseline).
    *
    * Input corpus columns: (user_id, beh, beh_words, is_query).
    * Output: per query user, its top-k candidates by (edit distance,
    * user_b). Recall vs the exact baseline is a property of the
    * bucketing parameters; TimeSeriesSpec asserts it like the ANN
    * recall specs. */
  def behaviorTopKLshOver(corpusIn: DataFrame, k: Int = 3): DataFrame = {
    // Probe shape, not pair-mining shape: the query rows' band keys
    // join against the corpus keys (|queries|·bands rows on the
    // small side — the [[graft.ops.Similarity.annLsh]] discipline),
    // instead of the all-corpus band self-join, whose candidate
    // volume explodes when the shingle alphabet is small. Candidates
    // are deduped as ID PAIRS before any behavior string re-joins.
    // The corpus feeds three plan branches (band keys plus both
    // string re-joins) — cached so the upstream per-user aggregation
    // runs once, not once per branch.
    val corpus = corpusIn.cache()
    // Band keys in the exploded-aggregation form (32 codegen'd min
    // aggregates — the per-row HOF array-min signature evaluates
    // interpreted, ~10× slower; see [[graft.ops.Similarity.annLsh]]),
    // but with ZERO new exchanges: the corpus arrives hash(user_id)
    // partitioned from its own groupBy, the explode preserves that,
    // and is_query rides the grouping keys (a subset-key-satisfied
    // clustering), so the signature aggregation never shuffles and
    // the probe side is a FILTER of the same cached key frame — no
    // separate query-id join.
    val minCols = (0 until 32).map(seed =>
      min(xxhash64(col("h"), lit(seed))).as(s"_m$seed"))
    val banded = corpus
      .select(col("user_id"), col("is_query"),
        explode(graft.functions.TextFunctions.shingleHashes(
          lower(col("beh_words")), 3)).as("h"))
      .groupBy(col("user_id"), col("is_query"))
      .agg(minCols.head, minCols.tail: _*)
      .withColumn("sig",
        array((0 until 32).map(i => col(s"_m$i")): _*))
      .select(col("user_id"), col("is_query"),
        posexplode(graft.functions.TextFunctions.minhashBands(
          col("sig"), bands = 16, rowsPerBand = 2)))
      .select(col("user_id"), col("is_query"),
        col("col.band").as("band"), col("col.bucket").as("bucket"))
      .cache()
    val qKeys = banded.filter(col("is_query"))
      .select(col("user_id").as("user_a"), col("band"), col("bucket"))
    val cand = qKeys
      .join(banded.select(col("user_id").as("user_b"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .filter(col("user_a") =!= col("user_b"))
      .select(col("user_a"), col("user_b"))
      // The id-pair frame is tiny in BYTES, so a bare distinct()'s
      // shuffle gets AQE-coalesced to one partition — which would
      // serialize the EXPENSIVE phase (per-candidate levenshtein is
      // CPU, not I/O). A FIXED-width repartition on the full pair key
      // pins the parallelism AND satisfies the distinct's clustering,
      // so the dedup aggregates in place with no exchange of its own
      // and the scoring runs 1-per-core wide.
      .repartition(corpusIn.sparkSession.sparkContext
        .defaultParallelism, col("user_a"), col("user_b"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_a")).orderBy(col("dist"), col("user_b"))
    cand
      .join(corpus.select(col("user_id").as("user_a"),
        col("beh").as("beh_a")), "user_a")
      .join(corpus.select(col("user_id").as("user_b"),
        col("beh").as("beh_b")), "user_b")
      .withColumn("dist", levenshtein(col("beh_a"), col("beh_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user_a"), col("user_b"),
        col("rank").cast("long").as("rank"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("user_a"), col("rank"))
  }

  /** Gate for the LSH scale path: inject a TWIN for every query user
    * (user_id + 100000, first event dropped — edit distance exactly 1,
    * event-trigram Jaccard ≈ 1 so its band collision is certain),
    * then require the twin to surface as the rank-1 candidate. The
    * fixture corpus has no natural pair within distance 2 (verified at
    * every shipped scale factor), and a twin of ANOTHER user is ≥
    * distance 2 from this query by the triangle inequality — so
    * "twin is top-1 at distance 1" is an exact, SQL-statable constant
    * while the candidates flow through the REAL bucketed machinery. */
  def behaviorLshGate(s: SparkSession, dir: String): DataFrame = {
    // cached: the twin branch would otherwise re-scan and re-aggregate
    // the raw event table a second time inside the union
    val base = behaviorCorpus(s, dir).cache()
    val twins = base.filter(col("user_id") < 50).select(
      (col("user_id") + 100000L).as("user_id"),
      expr("substring(beh, 2)").as("beh"),
      regexp_replace(col("beh_words"), "^\\S+ ?", "").as("beh_words"))
    val corpus = base.withColumn("is_query", col("user_id") < 50)
      .union(twins.withColumn("is_query", lit(false)))
    behaviorTopKLshOver(corpus, k = 3)
      .filter(col("rank") === 1)
      .select(col("user_a").as("user_id"),
        (col("user_b") === col("user_a") + 100000L).as("twin_is_top1"),
        (col("dist") === 1L).as("twin_dist_1"))
      .orderBy(col("user_id"))
  }

  val behaviorLshSql: String =
    """SELECT user_id, CAST(1 AS BOOLEAN) AS twin_is_top1,
      |  CAST(1 AS BOOLEAN) AS twin_dist_1
      |FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50)
      |ORDER BY user_id""".stripMargin

  /** Rolling-window feature table — the standard time-series feature
    * engineering pass (trailing statistics per entity): for every
    * event, count / decimal-exact sum / min / max of `value` over the
    * last `k` events of the same user.
    *
    * Scale shape: ONE window pass partitioned by user_id — thousands
    * of independent partitions, no self-join, no spine. The naive
    * formulation ("join each row to its k predecessors") is a range
    * self-join that multiplies the table by k; a rows-frame window
    * computes the same features in a single sort per partition, and
    * the sort key (user_id, ts, event_id) is the same one sessionize
    * and resample use, so a multi-feature pipeline reuses one shuffle
    * across all of them.
    *
    * Determinism: the (ts, event_id) order key is total; the sum runs
    * over DECIMAL(18,4) casts (bit-exact in any accumulation order)
    * and returns to DOUBLE only at the end; min/max are selections,
    * not accumulations — all hash-safe cross-engine. */
  def rollingFeatures(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(k - 1), Window.currentRow)
    events.select(
        col("user_id"), col("event_id"), col("value"),
        count(lit(1)).over(w).as("roll_n"),
        sum(col("value").cast(DecimalType(18, 4))).over(w)
          .cast(DoubleType).as("roll_sum"),
        min(col("value")).over(w).as("roll_min"),
        max(col("value")).over(w).as("roll_max"))
      .drop("value")
  }

  /** Gate: 10-event trailing features over the full event stream. */
  def rollingGate(s: SparkSession, dir: String): DataFrame =
    rollingFeatures(Tables.events(s, dir), k = 10)
      .orderBy(col("user_id"), col("event_id"))

  val rollingSql: String =
    """SELECT user_id, event_id,
      |  count(*) OVER w AS roll_n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS roll_sum,
      |  min(value) OVER w AS roll_min,
      |  max(value) OVER w AS roll_max
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Linear multi-touch attribution: every purchase's value is split
    * equally across ALL of the user's view/click touches in the
    * 3-day lookback before it, and credit is summed per touch
    * channel. The marketing-analytics shape as-of join (single last
    * touch) cannot express — fractional credit needs the full
    * touch set per conversion.
    *
    * Scale: the touch↔purchase join is EQUI on `user_id` (the range
    * bound is a post-join filter inside the hash join), so it
    * shuffles each side once by user — the same key both sides are
    * naturally clustered by. Per-purchase touch counts ride a window
    * over the join output (purchase-local, no extra shuffle past the
    * user partitioning), and the final per-channel reduce is 2 rows.
    *
    * Determinism: credit is integer micro-cents — `(value·10⁴) div
    * n_touches` — so channel sums are order-independent longs, not
    * float accumulation; the ÷10⁴ happens once at the end.
    */
  def attributionLinear(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"),
        floor(col("value") * 10000.0 + 0.5).cast(LongType).as("v4"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts").as("t_ts"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") <= col("p_ts") &&
        col("t_ts") > col("p_ts") - expr("interval 3 days"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_id"))
    joined
      .withColumn("n_t", count(lit(1)).over(w))
      .withColumn("credit4", expr("v4 div n_t"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("p_id")).as("n_purchases"),
        (sum(col("credit4")).cast(DoubleType) / 10000.0).as("credit"))
      .orderBy(col("channel"))
  }

  val attributionLinearSql: String =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, ts AS p_ts,
      |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_type AS channel, ts AS t_ts
      |  FROM events WHERE event_type IN ('view', 'click')),
      |j AS (
      |  SELECT p.p_id, t.channel, p.v4,
      |    COUNT(*) OVER (PARTITION BY p.p_id) AS n_t
      |  FROM p JOIN t ON p.user_id = t.user_id
      |   AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - INTERVAL '3 days')
      |SELECT channel, COUNT(*) AS n_touches,
      |  COUNT(DISTINCT p_id) AS n_purchases,
      |  CAST(SUM(v4 // n_t) AS DOUBLE) / 10000.0 AS credit
      |FROM j GROUP BY channel
      |ORDER BY channel""".stripMargin

  /** EWMA weights α(1−α)^i for α=0.3, i=0..7, frozen as 1e9-scaled
    * Scala literals injected into BOTH engines' plans — no runtime
    * pow is ever compared cross-engine. */
  private val EwmaW9: IndexedSeq[Long] = (0 until 8).map { i =>
    math.floor(0.3 * math.pow(0.7, i) * 1e9 + 0.5).toLong
  }
  private val EwmaW9Sum: Long = EwmaW9.sum

  /** Exponentially weighted moving average of `value` per user — the
    * classic recency-weighted feature, here as its exact 8-term
    * truncation so it is a pure rows-frame computation: 8 `lag`s with
    * FROZEN literal weights ride ONE (user_id, ts) window sort (the
    * same single shuffle rolling/sessionize share). Each weighted
    * term snaps to a 1e9-scaled long before the commutative sum; the
    * one closing division normalizes by the literal weight total.
    * Rows without a full 8-event history are not emitted (null lag
    * propagates through the long sum). */
  def ewma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val t9 = (0 until 8).map { i =>
      floor(lag(col("value"), i).over(w) * lit(EwmaW9(i)) + 0.5)
        .cast(LongType)
    }.reduce(_ + _)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("t9", t9)
      .filter(col("t9").isNotNull)
      .select(col("user_id"), col("event_id"),
        (col("t9").cast(DoubleType) / lit(EwmaW9Sum.toDouble)).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val ewmaSql: String = {
    val terms = (0 until 8).map { i =>
      s"CAST(floor((lag(value, $i) OVER w) * ${EwmaW9(i)} + 0.5) AS BIGINT)"
    }.mkString("\n      + ")
    s"""SELECT user_id, event_id,
       |  CAST(t9 AS DOUBLE) / $EwmaW9Sum AS ewma
       |FROM (
       |  SELECT user_id, event_id,
       |    $terms AS t9
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |WHERE t9 IS NOT NULL
       |ORDER BY user_id, event_id""".stripMargin
  }

  /** Lag-1 autocorrelation of each user's hourly value series — the
    * "is this metric momentum or noise" screen (near 1: trending,
    * near 0: white noise, negative: mean-reverting). Only pairs of
    * CONSECUTIVE hours enter (h = prev + 1h); gaps contribute
    * nothing rather than fabricating a correlation across them.
    * Decimal power sums (the q32 moments discipline) make the
    * aggregate order-independent; the final Pearson formula is a
    * fixed scalar expression snapped to 1e-6, identical both
    * engines.
    *
    * Scale: one (user, hour) aggregate, one per-user lag window
    * (same shuffle every per-entity feature shares), one
    * map-combinable power-sum reduce. Nothing is corpus-wide. */
  def tsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast(DecimalType(18, 4)))
        .cast(DecimalType(18, 4)).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
    val pairs = hourly
      .withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("ph", lag(col("h"), 1).over(w))
      .filter(col("ph").isNotNull &&
        col("h") === col("ph") + expr("INTERVAL 1 HOUR"))
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 8))
    val agg = pairs.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(d38(col("v"))).as("sx"),
      sum(d38(col("pv"))).as("sy"),
      sum(d38(col("v") * col("v"))).as("sxx"),
      sum(d38(col("pv") * col("pv"))).as("syy"),
      sum(d38(col("v") * col("pv"))).as("sxy"))
    def dd(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val n = dd(col("n"))
    val varx = n * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))
    val vary = n * dd(col("syy")) - dd(col("sy")) * dd(col("sy"))
    val cov = n * dd(col("sxy")) - dd(col("sx")) * dd(col("sy"))
    agg
      .filter(col("n") >= 3)
      .withColumn("corr6",
        when(varx > 0.0 && vary > 0.0,
          floor(cov / sqrt(varx * vary) * 1e6 + 0.5).cast(LongType)
            .cast(DoubleType) / 1e6))
      .select(col("user_id"), col("n").as("n_pairs"), col("corr6"))
      .orderBy(col("user_id"))
  }

  val tsAutocorrSql: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT user_id, h, v,
      |    lag(v) OVER (PARTITION BY user_id ORDER BY h) AS pv,
      |    lag(h) OVER (PARTITION BY user_id ORDER BY h) AS ph
      |  FROM hourly),
      |pairs AS (
      |  SELECT * FROM lagged
      |  WHERE ph IS NOT NULL AND h = ph + INTERVAL 1 HOUR),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    SUM(CAST(v AS DECIMAL(38,8))) AS sx,
      |    SUM(CAST(pv AS DECIMAL(38,8))) AS sy,
      |    SUM(CAST(v * v AS DECIMAL(38,8))) AS sxx,
      |    SUM(CAST(pv * pv AS DECIMAL(38,8))) AS syy,
      |    SUM(CAST(v * pv AS DECIMAL(38,8))) AS sxy
      |  FROM pairs GROUP BY user_id)
      |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |  THEN CAST(CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |      * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e6
      |  END AS corr6
      |FROM agg WHERE n >= 3
      |ORDER BY user_id""".stripMargin

  /** Hour-of-day seasonality profile per event type — the diurnal
    * fingerprint batch pipelines use to schedule compaction windows
    * and streaming jobs use to calibrate rate expectations. Share is
    * computed on an integer ppm grid (count·1e6 div type total) so
    * the division is exact in both engines. One map-combinable
    * aggregate plus an O(types) broadcast back. */
  def tsSeasonality(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("total_value"))
    val totals = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("tot"))
    hourly.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("hod").cast(LongType).as("hod"),
        col("n"), col("total_value"),
        (floor(col("n") * lit(1000000L) / col("tot")).cast(LongType)
          .cast(DoubleType) / 1e6).as("share"))
      .orderBy(col("event_type"), col("hod"))
  }

  val tsSeasonalitySql: String =
    """WITH hourly AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |      AS total_value
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
      |  FROM hourly GROUP BY 1)
      |SELECT h.event_type, h.hod, h.n, h.total_value,
      |  CAST(CAST(floor(h.n * 1000000 / t.tot) AS BIGINT) AS DOUBLE)
      |    / 1e6 AS share
      |FROM hourly h JOIN tot t USING (event_type)
      |ORDER BY event_type, hod""".stripMargin

  /** Classical additive decomposition (STL-lite): the hourly series
    * per event type splits into trend (centered 25-point moving
    * average), seasonal (per hour-of-day mean of the detrended
    * series), and residual — the decomposition every seasonality-aware
    * monitor/forecast starts from, where [[tsSeasonality]] only
    * profiles shares.
    *
    * Determinism: hourly values are exact DECIMAL sums; the trend
    * window sums DECIMALs (exact) and divides once by 25.0 in double;
    * the detrended deviation snaps to a 1e-6 long IMMEDIATELY, so the
    * cross-row seasonal mean is an integer sum + one floor division —
    * no float ever accumulates across rows. Edge hours (incomplete
    * 25-point window) carry NULL trend/dev and are excluded from the
    * seasonal means by SUM's NULL-skipping, identically in both
    * engines.
    *
    * Scale: the series frame is O(types · hours) — already reduced by
    * the first groupBy, windows partition by event_type, and the
    * seasonal mean is a (type, hod) groupBy of that reduced frame.
    * Only the first aggregate touches the corpus. */
  def tsDecompose(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).as("sv"))
      .select(col("event_type"), col("hr"),
        col("sv").cast(DoubleType).as("v"), col("sv"))
    val wTrend = w.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-12, 12)
    val detrended = hourly
      .withColumn("wn", count(lit(1)).over(wTrend))
      .withColumn("trend",
        when(col("wn") === 25,
          sum(col("sv")).over(wTrend).cast(DoubleType) / 25.0))
      .withColumn("dev_e6",
        floor((col("v") - col("trend")) * 1000000.0 + 0.5)
          .cast(LongType))
    val seasonal = detrended
      .groupBy(col("event_type"), hour(col("hr")).as("hod"))
      .agg(sum(col("dev_e6")).as("sdev"),
        count(col("dev_e6")).as("nd"))
      .select(col("event_type"), col("hod"),
        when(col("nd") > 0, floor(col("sdev").cast(DoubleType)
          / col("nd").cast(DoubleType)).cast(LongType))
          .as("seasonal_e6"))
    val se = seasonal.select(col("event_type").as("s_et"),
      col("hod").as("s_hod"), col("seasonal_e6"))
    detrended
      .join(broadcast(se), col("event_type") === col("s_et") &&
        hour(col("hr")) === col("s_hod"))
      .select(col("event_type"), col("hr"), col("v"),
        col("trend"), col("dev_e6"), col("seasonal_e6"),
        (col("dev_e6") - col("seasonal_e6")).as("resid_e6"))
      .orderBy(col("event_type"), col("hr"))
  }

  val tsDecomposeSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
      |  FROM events GROUP BY 1, 2),
      |h AS (
      |  SELECT event_type, hr, CAST(sv AS DOUBLE) AS v, sv
      |  FROM hourly),
      |tr AS (
      |  SELECT event_type, hr, v,
      |    CASE WHEN COUNT(*) OVER w25 = 25
      |      THEN CAST(SUM(sv) OVER w25 AS DOUBLE) / 25.0
      |    END AS trend
      |  FROM h
      |  WINDOW w25 AS (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |dt AS (
      |  SELECT event_type, hr, v, trend,
      |    CAST(floor((v - trend) * 1000000.0 + 0.5) AS BIGINT)
      |      AS dev_e6
      |  FROM tr),
      |se AS (
      |  SELECT event_type, hour(hr) AS hod,
      |    CASE WHEN COUNT(dev_e6) > 0
      |      THEN CAST(floor(CAST(SUM(dev_e6) AS DOUBLE)
      |        / CAST(COUNT(dev_e6) AS DOUBLE)) AS BIGINT)
      |    END AS seasonal_e6
      |  FROM dt GROUP BY 1, 2)
      |SELECT dt.event_type, dt.hr, dt.v, dt.trend, dt.dev_e6,
      |  se.seasonal_e6,
      |  dt.dev_e6 - se.seasonal_e6 AS resid_e6
      |FROM dt JOIN se
      |  ON dt.event_type = se.event_type AND hour(dt.hr) = se.hod
      |ORDER BY dt.event_type, dt.hr""".stripMargin

  /** Retention-cohort matrix — the product-analytics staple none of
    * the funnel/sessionize/gaps gates cover: users cohort by FIRST
    * active day, and each (cohort_day, day_offset) cell counts the
    * cohort's users active that many days later. All integer
    * (dates + datediff + counts).
    *
    * Scale: the first-touch reduce and the activity distinct both
    * key on user_id — ONE logical exchange serves the groupBy, the
    * distinct, and the join (the sessionize shared-exchange
    * discipline); the final matrix reduce is O(days²) cells. Because
    * (user, day) rows are pre-deduplicated, the cell count(*) IS the
    * distinct-user count — no second distinct shuffle. */
  def tsRetention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val first = active.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"))
    active.join(first, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_day"),
        col("day_offset").cast(LongType).as("day_offset"),
        col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val tsRetentionSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |first AS (
      |  SELECT user_id, MIN(d) AS cohort_day
      |  FROM active GROUP BY user_id)
      |SELECT f.cohort_day,
      |  CAST(a.d - f.cohort_day AS BIGINT) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM active a JOIN first f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** RFM (recency / frequency / monetary) quintile segmentation —
    * the classic behavioral-scoring pass on top of the per-user
    * reduce the other ts gates share. Quintile boundaries come from
    * ONE exact-percentile aggregate (array argument, rounded to 4 dp
    * — the q23/quantile-bins contract; `percentile_approx` is the
    * 100 TB default swap), broadcast as a single row; scoring is a
    * pure codegen CASE projection, so beyond the per-user reduce the
    * pass is shuffle-free. Recency scores INVERT (small = recent =
    * 5); the composite segment is `r·100 + f·10 + m`.
    *
    * Determinism: r/f are integers, m is one decimal-sum cast;
    * boundaries are 4-dp-rounded doubles compared with the same CAST
    * on both engines. */
  def tsRfm(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clock = ev.agg(max(to_date(col("ts"))).as("now"))
    val users = ev.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_d"),
        count(lit(1)).as("f"),
        sum(col("value").cast(DecimalType(18, 4))).as("mdec"))
      .crossJoin(broadcast(clock))
      .select(col("user_id"),
        datediff(col("now"), col("last_d")).cast(LongType).as("r"),
        col("f"), col("mdec").cast(DoubleType).as("m"))
    val b = users.agg(
        expr("percentile(r, array(0.2, 0.4, 0.6, 0.8))").as("rb"),
        expr("percentile(f, array(0.2, 0.4, 0.6, 0.8))").as("fb"),
        expr("percentile(m, array(0.2, 0.4, 0.6, 0.8))").as("mb"))
      .select((1 to 4).flatMap(i => Seq(
        round(element_at(col("rb"), i), 4).as(s"r$i"),
        round(element_at(col("fb"), i), 4).as(s"f$i"),
        round(element_at(col("mb"), i), 4).as(s"m$i"))): _*)
    def steps(v: org.apache.spark.sql.Column,
        bs: Seq[org.apache.spark.sql.Column],
        invert: Boolean): org.apache.spark.sql.Column =
      bs.map(bnd =>
        if (invert) when(v.cast(DoubleType) <= bnd, 1L).otherwise(0L)
        else when(v.cast(DoubleType) > bnd, 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    users.crossJoin(broadcast(b))
      .select(col("user_id"), col("r"), col("f"),
        round(col("m"), 4).as("m4"),
        steps(col("r"), (1 to 4).map(i => col(s"r$i")), invert = true)
          .as("r_score"),
        steps(col("f"), (1 to 4).map(i => col(s"f$i")), invert = false)
          .as("f_score"),
        steps(col("m"), (1 to 4).map(i => col(s"m$i")), invert = false)
          .as("m_score"))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy(col("user_id"))
  }

  val tsRfmSql: String =
    """WITH clock AS (SELECT MAX(CAST(ts AS DATE)) AS now FROM events),
      |users AS (
      |  SELECT user_id,
      |    CAST(now - MAX(CAST(ts AS DATE)) AS BIGINT) AS r,
      |    COUNT(*) AS f,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS m
      |  FROM events CROSS JOIN clock
      |  GROUP BY user_id, now),
      |b AS (SELECT
      |    ROUND(quantile_cont(r, 0.2), 4) AS r1,
      |    ROUND(quantile_cont(r, 0.4), 4) AS r2,
      |    ROUND(quantile_cont(r, 0.6), 4) AS r3,
      |    ROUND(quantile_cont(r, 0.8), 4) AS r4,
      |    ROUND(quantile_cont(f, 0.2), 4) AS f1,
      |    ROUND(quantile_cont(f, 0.4), 4) AS f2,
      |    ROUND(quantile_cont(f, 0.6), 4) AS f3,
      |    ROUND(quantile_cont(f, 0.8), 4) AS f4,
      |    ROUND(quantile_cont(m, 0.2), 4) AS m1,
      |    ROUND(quantile_cont(m, 0.4), 4) AS m2,
      |    ROUND(quantile_cont(m, 0.6), 4) AS m3,
      |    ROUND(quantile_cont(m, 0.8), 4) AS m4b
      |  FROM users),
      |scored AS (
      |  SELECT user_id, r, f, ROUND(m, 4) AS m4,
      |    (CASE WHEN CAST(r AS DOUBLE) <= r1 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(r AS DOUBLE) <= r2 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(r AS DOUBLE) <= r3 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(r AS DOUBLE) <= r4 THEN 1 ELSE 0 END
      |     + 1) AS r_score,
      |    (CASE WHEN CAST(f AS DOUBLE) > f1 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(f AS DOUBLE) > f2 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(f AS DOUBLE) > f3 THEN 1 ELSE 0 END
      |     + CASE WHEN CAST(f AS DOUBLE) > f4 THEN 1 ELSE 0 END
      |     + 1) AS f_score,
      |    (CASE WHEN m > m1 THEN 1 ELSE 0 END
      |     + CASE WHEN m > m2 THEN 1 ELSE 0 END
      |     + CASE WHEN m > m3 THEN 1 ELSE 0 END
      |     + CASE WHEN m > m4b THEN 1 ELSE 0 END
      |     + 1) AS m_score
      |  FROM users CROSS JOIN b)
      |SELECT user_id, r, CAST(f AS BIGINT) AS f, m4,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
      |    AS segment
      |FROM scored
      |ORDER BY user_id""".stripMargin

  /** Seasonal-naive forecast backtest — the baseline every forecast
    * pipeline must beat before a model earns its keep: ŷ(type, day d,
    * hour h) = y(type, d−1 same-hod slot), evaluated over every
    * (day, hour) cell with a predecessor. Per type it emits the
    * evaluation count, MAE and signed bias. Errors are DECIMAL-exact
    * differences (never a float accumulation); each reported metric
    * is ONE double division rounded to 6 dp — the mean6/sd6
    * contract.
    *
    * Scale: the corpus reduces to O(type·day·24) cells in the first
    * map-combinable aggregate; the lag window partitions by
    * (type, hod) — thousands of independent partitions — and the
    * final reduce is O(types). */
  def tsForecastSnaive(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("hod")).orderBy(col("d"))
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"),
        hour(col("ts")).as("hod"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).as("sv"))
    hourly
      .withColumn("fc", lag(col("sv"), 1).over(w))
      .filter(col("fc").isNotNull)
      .withColumn("err", col("sv") - col("fc"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("err"))).as("sae"),
        sum(col("err")).as("se"))
      .select(col("event_type"), col("n_eval"),
        round(col("sae").cast(DoubleType) /
          col("n_eval").cast(DoubleType), 6).as("mae6"),
        round(col("se").cast(DoubleType) /
          col("n_eval").cast(DoubleType), 6).as("bias6"))
      .orderBy(col("event_type"))
  }

  val tsForecastSnaiveSql: String =
    """WITH hourly AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    hour(ts) AS hod,
      |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
      |  FROM events GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT event_type, sv,
      |    LAG(sv) OVER (PARTITION BY event_type, hod ORDER BY d)
      |      AS fc
      |  FROM hourly),
      |err AS (
      |  SELECT event_type, sv - fc AS err
      |  FROM scored WHERE fc IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_eval,
      |  round(CAST(SUM(ABS(err)) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mae6,
      |  round(CAST(SUM(err) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS bias6
      |FROM err GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Seasonally-adjusted anomaly screen: the [[DataQuality.dqAnomaly]]
    * z-score idiom re-keyed on (event_type, hour-of-day), so each
    * observation is judged against ITS OWN seasonal baseline — a spike
    * that is normal at peak hour but anomalous at 3am is caught, and a
    * diurnal swing is NOT flagged (both of which the season-blind
    * screen gets wrong). 2σ threshold (the seasonal baselines have
    * ~1/24 the data each, so the 3σ screen would be vacuous at small
    * SF). Plan shape inherited from [[DataQuality.zScoreOutliersBy]]:
    * two scans, O(type·24) stats broadcast back, deterministic
    * decimal-power-sum doubles. */
  def tsSeasonalAnomaly(s: SparkSession, dir: String): DataFrame =
    DataQuality.zScoreOutliersBy(
      Tables.events(s, dir)
        .withColumn("hod", hour(col("ts")).cast(LongType)),
      Seq("event_type", "hod"), "value", sigmas = 2.0)

  val tsSeasonalAnomalySql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, value
      |  FROM events),
      |s AS (
      |  SELECT event_type, hod, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))
      |      * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS svv
      |  FROM e GROUP BY event_type, hod),
      |st AS (
      |  SELECT event_type, hod, n, sv / n AS mean,
      |    sqrt(greatest(svv / n - (sv / n) * (sv / n), 0.0)) AS sd
      |  FROM s)
      |SELECT st.event_type, st.hod, st.n,
      |  CAST(SUM(CASE WHEN abs(e.value - st.mean) > 2.0 * st.sd
      |      THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
      |  round(st.mean, 6) AS mean6, round(st.sd, 6) AS sd6
      |FROM e JOIN st USING (event_type, hod)
      |GROUP BY st.event_type, st.hod, st.n, st.mean, st.sd
      |ORDER BY st.event_type, st.hod""".stripMargin

  /** CUSUM changepoint per event type over the daily value series:
    * the split day k maximizing |N·prefix(k) − k·total| — the
    * N-scaled cumulative deviation from the series mean (scaling by
    * N clears the mean's division, so the score is EXACT decimal
    * arithmetic end to end; doubles never accumulate). Emits the
    * argmax day per type with its 1e6-ppm-normalized score.
    *
    * Scale: one map-side-combined daily aggregate (days × types
    * rows), then windows partitioned BY TYPE over day-count-sized
    * frames — nothing corpus-sized shuffles twice, no driver loop.
    * Ties break on earliest day via (score desc, day asc) ordering.
    *
    * The score is emitted as `cusum_dev_e4 BIGINT` — the exact
    * integer ten-thousandths of the DECIMAL(38,4) deviation (4-dp
    * operands times integers keep scale 4, so ·1e4 is an integer by
    * construction). Emitting the wide decimal itself hash-failed two
    * rounds running on cross-release decimal canonicalization in the
    * oracle engine despite value-identical rows; the final projection
    * is now BIGINT/VARCHAR/DATE only, version-insensitive by
    * construction. */
  def tsChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).as("v"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = byType.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("prefix",
        sum(col("v")).over(ordered).cast(DecimalType(20, 4)))
      .withColumn("k", row_number().over(byType.orderBy(col("day")))
        .cast(LongType))
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("total",
        sum(col("v")).over(byType).cast(DecimalType(20, 4)))
      // N·prefix − k·total: every operand is pinned to an explicit
      // decimal type and each product stays under precision 38, so
      // no engine-specific promotion/cap rule ever fires —
      // DECIMAL(10,0)×DECIMAL(20,4) is exact in Spark and DuckDB
      // alike, and the DECIMAL(37,4) products subtract into a clean
      // DECIMAL(38,4) in both.
      .withColumn("dev",
        abs((col("n_days").cast(DecimalType(10, 0)) * col("prefix"))
            .cast(DecimalType(37, 4)) -
          (col("k").cast(DecimalType(10, 0)) * col("total"))
            .cast(DecimalType(37, 4)))
          .cast(DecimalType(38, 4)))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("dev").desc, col("day"))
    scored
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("k").as("cp_index"), col("n_days"),
        // DECIMAL(30,4)·DECIMAL(5,0) → DECIMAL(36,4), exact in both
        // engines; the cast to BIGINT drops a .0000 fraction only.
        (col("dev").cast(DecimalType(30, 4)) *
          lit(10000L).cast(DecimalType(5, 0)))
          .cast(LongType).as("cusum_dev_e4"))
      .orderBy(col("event_type"))
  }

  val tsChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, day,
      |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS DECIMAL(20,4)) AS prefix,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY day) AS BIGINT) AS k,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS n_days,
      |    CAST(SUM(v) OVER (PARTITION BY event_type)
      |      AS DECIMAL(20,4)) AS total
      |  FROM daily),
      |dev AS (
      |  SELECT event_type, day, k, n_days,
      |    CAST(ABS(
      |      CAST(CAST(n_days AS DECIMAL(10,0)) * prefix
      |        AS DECIMAL(37,4))
      |      - CAST(CAST(k AS DECIMAL(10,0)) * total
      |        AS DECIMAL(37,4))) AS DECIMAL(38,4)) AS dev
      |  FROM scored),
      |pick AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY dev DESC, day) AS rk
      |  FROM dev)
      |SELECT event_type, day AS cp_day, k AS cp_index, n_days,
      |  CAST(CAST(dev AS DECIMAL(30,4)) * CAST(10000 AS DECIMAL(5,0))
      |    AS BIGINT) AS cusum_dev_e4
      |FROM pick WHERE rk = 1
      |ORDER BY event_type""".stripMargin

  /** Interval-union coverage per user — each event opens a 30-minute
    * activity interval; overlaps must count once. The classic
    * sweep-line: order a user's intervals by start, carry the running
    * max of prior ends, and each interval contributes
    * `max(0, end − max(start, prevMaxEnd))` — summing those gap
    * contributions IS the measure of the union. "Actual engaged
    * time" for billing/engagement, dwell time from beacons, speech
    * coverage from utterance spans.
    *
    * Scale: one window partitioned by user (thousands of independent
    * partitions, no global sort) + one map-side-combined groupBy.
    * All arithmetic on integer epoch-micros — hash-exact. Equal-
    * length intervals make tie order irrelevant: equal starts imply
    * equal ends, so the running max is tie-insensitive. */
  def tsIntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val lenUs = 30L * 60 * 1000000 // 30 min in micros
    val iv = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s0"))
      .withColumn("e0", col("s0") + lit(lenUs))
    val w = Window.partitionBy(col("user_id")).orderBy(col("s0"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("prev_end", max(col("e0")).over(w))
      .withColumn("add",
        when(col("prev_end").isNull, col("e0") - col("s0"))
          .otherwise(greatest(
            col("e0") - greatest(col("prev_end"), col("s0")), lit(0L))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("add")).as("covered_us"))
      .select(col("user_id"), col("n_intervals"), col("covered_us"),
        expr("covered_us div 60000000").as("covered_min"))
      .orderBy(col("user_id"))
  }

  val tsIntervalUnionSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + 1800000000 AS e0
      |  FROM events),
      |sweep AS (
      |  SELECT user_id, s0, e0,
      |    MAX(e0) OVER (PARTITION BY user_id ORDER BY s0
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_end
      |  FROM iv)
      |SELECT user_id, COUNT(*) AS n_intervals,
      |  CAST(SUM(CASE WHEN prev_end IS NULL THEN e0 - s0
      |    ELSE GREATEST(e0 - GREATEST(prev_end, s0), 0) END)
      |    AS BIGINT) AS covered_us,
      |  CAST(SUM(CASE WHEN prev_end IS NULL THEN e0 - s0
      |    ELSE GREATEST(e0 - GREATEST(prev_end, s0), 0) END)
      |    // 60000000 AS BIGINT) AS covered_min
      |FROM sweep GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user (the classic streak analysis — DAU streaks, retention
    * "current streak ≥ N" cohorts). The island key is the standard
    * constant-difference trick: within a user, `epoch_day −
    * row_number()` is constant exactly along a gap-free run, so one
    * per-user window sort labels every island without self-joins or
    * iteration. Integer day arithmetic end to end — hash-exact.
    *
    * Scale: the (user, day) distinct is map-side combinable down to
    * O(users × active days); the window partitions by user (millions
    * of small independent partitions — no global sort); both
    * follow-up aggregates reuse the same user-keyed shuffle under
    * AQE. Nothing is quadratic in days: a 10-year streak is one
    * group, not a 3650-wide frame re-scan. */
  def tsGapsIslands(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_run"),
        sum(col("len")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  val tsGapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, COUNT(*) AS len
      |  FROM isl GROUP BY user_id, grp)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(MAX(len) AS BIGINT) AS longest_run,
      |  CAST(SUM(len) AS BIGINT) AS n_active_days
      |FROM runs GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Markov removal-effect attribution (Anderl et al. 2016 — the
    * data-driven alternative to first/last-touch rules like
    * [[attributionLinear]]): user journeys up to first purchase
    * define a first-order chain (START → channels → CONV, untracked
    * loss implicit); a channel's credit is how much the conversion
    * probability DROPS when the channel is removed (transitions into
    * it redirected to the null absorber).
    *
    * One chain computes every removal at once: absorption vectors are
    * keyed by (removed_channel ∪ NONE, state) — a data-driven
    * composite, no per-channel plan duplication — and iterated `iters`
    * fixed rounds of v ← direct + (Σ relay·v) div 10⁶ in exact ppm
    * integers (every operand non-negative, so Spark's truncating
    * `div` and DuckDB's floor `//` agree; both engines run the same
    * 12 rounds, so partial convergence is still bit-identical).
    *
    * Scale: journeys reduce to an O(channels²) transition table in
    * one windowed pass + one aggregation; every iteration joins only
    * O(channels²)-sized frames (broadcast both sides); the event
    * corpus is read once. The oracle unrolls the identical
    * recurrence. */
  def attributionMarkov(s: SparkSession, dir: String,
      iters: Int = 12): DataFrame = {
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val fp = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("fts"),
        col("event_id").as("fid"))
    val steps = ev.filter(col("event_type") =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter(col("fts").isNull || col("ts") < col("fts") ||
        (col("ts") === col("fts") && col("event_id") < col("fid")))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("st"), col("fts").isNotNull.as("conv"))
    val seq = steps
      .withColumn("nxt", lead(col("st"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint()
    val mids = seq.select(col("st").as("s"),
      coalesce(col("nxt"),
        when(col("conv"), lit("CONV")).otherwise(lit("NULL"))).as("d"))
    val starts = seq.filter(col("rn") === 1)
      .select(lit("START").as("s"), col("st").as("d"))
    val zeroStep = fp
      .join(steps.select(col("user_id")).distinct(),
        Seq("user_id"), "left_anti")
      .select(lit("START").as("s"), lit("CONV").as("d"))
    val tc = mids.unionByName(starts).unionByName(zeroStep)
      .groupBy(col("s"), col("d")).agg(count(lit(1)).as("c"))
    val ow = tc.groupBy(col("s")).agg(sum(col("c")).as("o"))
    val tr = tc.join(broadcast(ow), "s").filter(col("d") =!= "NULL")
      .select(col("s"), col("d"), expr("(c * 1000000) div o").as("ppm"))
      .localCheckpoint()
    // The chain itself is the MODEL — O(channels²) integer ppm rows
    // (marketing channels number in the dozens at any corpus size),
    // collected like the CMS sketch / IVF centroids / BPE merges.
    // The corpus-side work (journeys → transition counts) stays
    // distributed above; iterating a ≤channels²-cell vector through
    // 12 Spark jobs would spend seconds of scheduler latency on
    // microseconds of arithmetic.
    val trRows = tr.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // Channels come from the STEP stream, not the pruned transition
    // table — a channel whose every outgoing edge is untracked loss
    // (d = NULL) still exists and must report a (zero) effect.
    val chans = steps.select(col("st")).distinct()
      .collect().map(_.getString(0)).sorted
    val directM = trRows.collect {
      case (src, "CONV", p) => src -> p
    }.toMap
    val relayM = trRows.filter(t => t._2 != "CONV")
    val states = ("START" +: chans)
    def solve(removed: String): Long = {
      var v = Map.empty[String, Long].withDefaultValue(0L)
      for (_ <- 1 to iters) {
        v = states.filter(_ != removed).map { st =>
          val acc = relayM.collect {
            case (s, d, p) if s == st && d != removed => p * v(d)
          }.sum
          st -> (directM.getOrElse(st, 0L) + acc / 1000000L)
        }.toMap.withDefaultValue(0L)
      }
      v("START")
    }
    val full = solve("NONE")
    import s.implicits._
    chans.toSeq.map(c => (c, full, solve(c), full - solve(c)))
      .toDF("channel", "p_full_ppm", "p_removed_ppm", "effect_ppm")
      .orderBy(col("channel"))
  }

  /** The identical (removal, state)-keyed recurrence unrolled. */
  def attributionMarkovSql(iters: Int = 12): String = {
    val base =
      """WITH fp AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |steps AS (
        |  SELECT e.user_id, e.ts, e.event_id, e.event_type AS st,
        |    fp.user_id IS NOT NULL AS conv
        |  FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
        |  WHERE e.event_type <> 'purchase'
        |    AND (fp.user_id IS NULL OR e.ts < fp.ts
        |         OR (e.ts = fp.ts AND e.event_id < fp.event_id))),
        |seq AS (
        |  SELECT user_id, st, conv,
        |    LEAD(st) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM steps),
        |trans AS (
        |  SELECT st AS s,
        |    COALESCE(nxt, CASE WHEN conv THEN 'CONV' ELSE 'NULL' END) AS d
        |  FROM seq
        |  UNION ALL
        |  SELECT 'START', st FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT 'START', 'CONV' FROM fp
        |  WHERE user_id NOT IN (SELECT DISTINCT user_id FROM steps)),
        |tc AS (SELECT s, d, COUNT(*) AS c FROM trans GROUP BY s, d),
        |ow AS (SELECT s, SUM(c) AS o FROM tc GROUP BY s),
        |tr AS (SELECT tc.s, tc.d, CAST((tc.c * 1000000) // ow.o AS BIGINT)
        |         AS ppm
        |       FROM tc JOIN ow ON ow.s = tc.s WHERE tc.d <> 'NULL'),
        |chan AS (SELECT DISTINCT st AS ch FROM steps),
        |rset AS (SELECT ch AS rc FROM chan UNION ALL SELECT 'NONE'),
        |sb AS (SELECT ch AS s FROM chan UNION ALL SELECT 'START'),
        |states AS (SELECT r.rc, b.s FROM rset r CROSS JOIN sb b
        |           WHERE b.s <> r.rc),
        |direct AS (SELECT s, ppm AS dppm FROM tr WHERE d = 'CONV'),
        |relay AS (SELECT s, d, ppm FROM tr WHERE d <> 'CONV'),
        |v0 AS (SELECT rc, s, CAST(0 AS BIGINT) AS v FROM states)"""
        .stripMargin
    val its = (1 to iters).map { i =>
      s"""v$i AS (
         |  SELECT p.rc, p.s,
         |    COALESCE(MIN(dd.dppm), 0)
         |      + COALESCE(SUM(t.ppm * q.v), 0) // 1000000 AS v
         |  FROM states p
         |  LEFT JOIN direct dd ON dd.s = p.s
         |  LEFT JOIN relay t ON t.s = p.s AND t.d <> p.rc
         |  LEFT JOIN v${i - 1} q ON q.rc = p.rc AND q.s = t.d
         |  GROUP BY p.rc, p.s)""".stripMargin
    }
    (base +: its).mkString(",\n") +
      s"""
         |SELECT c.ch AS channel, CAST(f.v AS BIGINT) AS p_full_ppm,
         |  CAST(r.v AS BIGINT) AS p_removed_ppm,
         |  CAST(f.v - r.v AS BIGINT) AS effect_ppm
         |FROM chan c
         |JOIN v$iters f ON f.rc = 'NONE' AND f.s = 'START'
         |JOIN v$iters r ON r.rc = c.ch AND r.s = 'START'
         |ORDER BY channel""".stripMargin
  }

  /** Time-weighted average of `value` per user — the sensor/metrics
    * aggregate where sample-and-hold readings must be weighted by how
    * LONG they held, not how often they fired (a plain AVG
    * over-weights bursts): TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δtᵢ the micros
    * until the next reading; the final reading holds nothing.
    *
    * Determinism: values snap to integer ten-thousandths (exact via
    * the DECIMAL(18,4) ×10⁴ path) and durations are integer micros —
    * numerator, denominator, and the final `div` are ALL integer ops,
    * so the reported TWA (in 1e-4 value units) is bit-exact with no
    * IEEE division anywhere. One windowed pass (lead) + one grouped
    * reduce, both on the user_id partitioning — a single exchange end
    * to end. */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 4)) * 10000)
          .cast(LongType).as("v4"))
      .withColumn("dt",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("v4") * col("dt")).as("num"),
        sum(col("dt")).as("den"))
      .select(col("user_id"),
        expr("num div den").as("twa_e4"),
        col("den").as("span_us"))
      .orderBy(col("user_id"))
  }

  val timeWeightedAvgSql: String =
    """WITH seq AS (
      |  SELECT user_id,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4,
      |    epoch_us(LEAD(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id)) - epoch_us(ts) AS dt
      |  FROM events)
      |SELECT user_id,
      |  CAST(SUM(v4 * dt) // SUM(dt) AS BIGINT) AS twa_e4,
      |  CAST(SUM(dt) AS BIGINT) AS span_us
      |FROM seq WHERE dt IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Windowed funnel — [[funnel]] with a conversion BUDGET: each
    * stage must land within `windowSec` of the PREVIOUS stage's
    * first touch, the semantics product analytics actually reports
    * ("purchased within an hour of clicking"), and the one the
    * unbounded funnel silently overstates. Same chained
    * min-aggregate shape — per stage one type-pruned scan joined to
    * the O(users) prior-stage frame, the interval test a pure
    * integer-micros filter — so the scale story is unchanged: no
    * window functions, no self-joins, shuffles carry one row per
    * qualifying user. */
  def funnelWindowed(s: SparkSession, dir: String,
      windowSec: Long = 3600): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val wUs = windowSec * 1000000L
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") &&
        unix_micros(col("ts")) - unix_micros(col("t1")) <= wUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("t2") &&
        unix_micros(col("ts")) - unix_micros(col("t2")) <= wUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(label).as("stage"), col("users"))
    stage(t1, "1_view").unionAll(stage(t2, "2_click_1h"))
      .unionAll(stage(t3, "3_purchase_1h"))
      .orderBy(col("stage"))
  }

  val funnelWindowedSql: String =
    """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |       JOIN t1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > t1.t1
      |         AND epoch_us(e.ts) - epoch_us(t1.t1) <= 3600000000
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |       JOIN t2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |         AND epoch_us(e.ts) - epoch_us(t2.t2) <= 3600000000
      |       GROUP BY e.user_id)
      |SELECT '1_view' AS stage, COUNT(*) AS users FROM t1
      |UNION ALL
      |SELECT '2_click_1h', COUNT(*) FROM t2
      |UNION ALL
      |SELECT '3_purchase_1h', COUNT(*) FROM t3
      |ORDER BY stage""".stripMargin

  /** Lagged cross-correlation between two daily event-count series —
    * the lead/lag diagnostic ([[tsAutocorr]] correlates a series with
    * ITSELF; cross-correlation asks "does activity in type A lead
    * activity in type B by k days?"). Series are the daily counts of
    * the lexicographically first and last event types, zero-filled
    * onto the data's own [min, max] date spine so quiet days count as
    * zeros rather than silently shrinking the overlap. For each lag
    * 0..`maxLag`, Pearson r over pairs (x_t, y_{t+lag}) in the
    * cross-multiplied integer form: all five power sums are exact
    * BIGINTs, and r is ONE fixed double expression
    * `(n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)·(n·Σyy − Σy²))` —
    * identical operand order in the oracle, bit-identical doubles.
    *
    * Scale: one map-combined (date) count over the two filtered
    * types; the spine, the lag fan-out (maxLag+1 copies of a
    * days-sized frame), and the final per-lag reduce are all
    * metadata-sized next to the corpus scan. */
  def crossCorr(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir)
    val tm = ev.agg(min(col("event_type")).as("ta"),
      max(col("event_type")).as("tb"))
    val daily = ev.crossJoin(broadcast(tm))
      .filter(col("event_type") === col("ta") ||
        col("event_type") === col("tb"))
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(sum(when(col("event_type") === col("ta"), 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === col("tb"), 1L).otherwise(0L))
          .as("y"))
    val spine = daily.agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("dt"))
    val series = spine.join(daily, Seq("dt"), "left")
      .select(col("dt"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint()
    val xs = series.select(col("dt"), col("x"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
    val pairs = xs.join(series.select(col("dt").as("dt2"), col("y")),
      date_add(col("dt"), col("lag")) === col("dt2"))
    pairs.groupBy(col("lag").cast(LongType).as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        when(
          (col("n") * col("sxx") - col("sx") * col("sx")) === 0L ||
          (col("n") * col("syy") - col("sy") * col("sy")) === 0L,
          lit(0.0))
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType)
            / sqrt(
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast(DoubleType)
              * (col("n") * col("syy") - col("sy") * col("sy"))
                .cast(DoubleType))).as("r"))
      .orderBy(col("lag"))
  }

  val crossCorrSql: String =
    """WITH tm AS (
      |  SELECT MIN(event_type) AS ta, MAX(event_type) AS tb
      |  FROM events),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS dt,
      |    CAST(SUM(CASE WHEN event_type = tm.ta THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = tm.tb THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events, tm
      |  WHERE event_type = tm.ta OR event_type = tm.tb
      |  GROUP BY 1),
      |bounds AS (SELECT MIN(dt) AS d0, MAX(dt) AS d1 FROM daily),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS dt
      |  FROM bounds),
      |series AS (
      |  SELECT s.dt, COALESCE(d.x, 0) AS x, COALESCE(d.y, 0) AS y
      |  FROM spine s LEFT JOIN daily d ON d.dt = s.dt),
      |lags AS (SELECT unnest(range(0, 8)) AS lag),
      |pairs AS (
      |  SELECT l.lag, a.x, b.y
      |  FROM series a
      |  JOIN lags l ON TRUE
      |  JOIN series b ON b.dt = a.dt + CAST(l.lag AS INTEGER)),
      |sums AS (
      |  SELECT CAST(lag AS BIGINT) AS lag, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY 1)
      |SELECT lag, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
      |    THEN 0.0
      |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |             * CAST(n * syy - sy * sy AS DOUBLE))
      |  END AS r
      |FROM sums ORDER BY lag""".stripMargin

  /** Local-maxima (peak) detection on the per-type daily series —
    * the spike finder ([[tsSeasonalAnomaly]] flags σ-outliers
    * against a profile; a peak is purely SHAPE: strictly above both
    * observed neighbors, no distribution assumed). Emits each peak
    * with its one-step prominence `cnt − max(prev, next)`. All
    * counts/differences are exact BIGINTs; series edges (null
    * neighbor) are excluded by definition.
    *
    * Scale: the corpus pass is one map-combinable (type, day) count;
    * the lag/lead window runs on the types×days GRID frame, never
    * the raw events. Gaps in the observed series mean "neighbor" is
    * the adjacent OBSERVED day — the same contract as the oracle. */
  def tsPeaks(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dt"))
    daily
      .withColumn("prev", lag(col("cnt"), 1).over(w))
      .withColumn("nxt", lead(col("cnt"), 1).over(w))
      .filter(col("prev").isNotNull && col("nxt").isNotNull &&
        col("cnt") > col("prev") && col("cnt") > col("nxt"))
      .select(col("event_type"), col("dt"), col("cnt"),
        (col("cnt") - greatest(col("prev"), col("nxt")))
          .as("prominence"))
      .orderBy(col("event_type"), col("dt"))
  }

  val tsPeaksSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS dt, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |nb AS (
      |  SELECT event_type, dt, cnt,
      |    LAG(cnt) OVER (PARTITION BY event_type ORDER BY dt) AS prev,
      |    LEAD(cnt) OVER (PARTITION BY event_type ORDER BY dt) AS nxt
      |  FROM daily)
      |SELECT event_type, dt, cnt,
      |  CAST(cnt - GREATEST(prev, nxt) AS BIGINT) AS prominence
      |FROM nb
      |WHERE prev IS NOT NULL AND nxt IS NOT NULL
      |  AND cnt > prev AND cnt > nxt
      |ORDER BY event_type, dt""".stripMargin

  /** Linear gap interpolation — the other standard resampling fill
    * ([[resampleFfill]] carries the LAST value forward; metering and
    * sensor math want the straight line between neighbors):
    * on the fixture-fixed January 2024 hourly grid, each missing
    * hour strictly BETWEEN two observations gets
    * `prev + (next − prev)·(h − t_prev)/(t_next − t_prev)`;
    * leading/trailing gaps stay unfilled (no extrapolation).
    * Neighbor values AND their timestamps come from the same
    * IGNORE-NULLS window pair; the interpolant is ONE fixed double
    * tree over decimal-exact endpoint values and integer epoch
    * deltas, 1e-6-snapped per hour BEFORE the per-user sum.
    *
    * Scale: identical exchange discipline to [[resampleFfill]] —
    * one hash(user) clustering of the map-combined hourly frame
    * serves the spine join and both windows. */
  def tsInterpolate(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
        .as("v"))
      .repartition(col("user_id")).cache()
    // One user row per user via distinct, NOT a row_number window:
    // the window form sorts the whole hourly frame per user just to
    // keep one row it then projects away; distinct is a hash
    // aggregate on the same hash(user_id) clustering (no sort, no
    // extra exchange) and yields the identical user set.
    val spine = hourly
      .select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(
          lit("2024-01-01 00:00:00").cast(TimestampType),
          lit("2024-01-30 23:00:00").cast(TimestampType),
          expr("INTERVAL 1 HOUR"))).as("h"))
    val past = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hourly.hint("merge"), Seq("user_id", "h"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(past))
      .withColumn("tp", last(when(col("v").isNotNull, col("h")),
        ignoreNulls = true).over(past))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(future))
      .withColumn("tn", first(when(col("v").isNotNull, col("h")),
        ignoreNulls = true).over(future))
      .withColumn("iv", when(col("v").isNotNull, col("v"))
        .when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv") + (col("nv") - col("pv"))
            * ((unix_timestamp(col("h")) - unix_timestamp(col("tp")))
              .cast(DoubleType)
              / (unix_timestamp(col("tn")) - unix_timestamp(col("tp")))
              .cast(DoubleType))))
      .groupBy(col("user_id"))
      .agg(sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_obs"),
        sum(when(col("v").isNull && col("iv").isNotNull, 1L)
          .otherwise(0L)).as("n_interp"),
        sum(expr("CAST(floor(iv * 1000000.0 + 0.5) AS BIGINT)"))
          .as("sum_e6"))
      .orderBy(col("user_id"))
  }

  val tsInterpolateSql: String =
    """WITH hours AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |users AS (SELECT DISTINCT user_id FROM events),
      |grid AS (
      |  SELECT u.user_id, hours.h, hourly.v
      |  FROM users u CROSS JOIN hours
      |  LEFT JOIN hourly ON hourly.user_id = u.user_id
      |    AND hourly.h = hours.h),
      |nb AS (
      |  SELECT user_id, h, v,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |      ROW) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED
      |      FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
      |  FROM grid),
      |iv AS (
      |  SELECT user_id, v,
      |    CASE WHEN v IS NOT NULL THEN v
      |         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |           pv + (nv - pv)
      |             * (CAST(epoch(h) - epoch(tp) AS DOUBLE)
      |                / CAST(epoch(tn) - epoch(tp) AS DOUBLE))
      |    END AS iv
      |  FROM nb)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_obs,
      |  CAST(SUM(CASE WHEN v IS NULL AND iv IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_interp,
      |  CAST(SUM(CAST(floor(iv * 1000000.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS sum_e6
      |FROM iv GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Burstiness (Fano factor / index of dispersion) of the per-type
    * daily series — "is traffic Poisson or bursty?": variance-to-
    * mean ratio of daily counts, > 1 flags clumping that invalidates
    * Poisson capacity math and marks campaign/bot bursts. Daily
    * counts are exact integers, so the population variance comes
    * from the cross-multiplied integer form
    * `(n·Σx² − (Σx)²)` — BIGINT throughout — and the Fano factor is
    * ONE fixed double expression `(n·Σx² − Σx²)·/(n·Σx)` evaluated
    * identically in both engines.
    *
    * Scale: one map-combinable (type, day) count, then per-type
    * scalar sums over the grid frame. */
  def tsBurstiness(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).as("sx"),
        sum(col("c") * col("c")).as("sxx"))
      .selectExpr("event_type", "n_days", "sx", "sxx",
        "CASE WHEN sx = 0 THEN 0.0 ELSE" +
          " CAST(n_days * sxx - sx * sx AS DOUBLE)" +
          " / CAST(n_days * sx AS DOUBLE) END AS fano")
      .orderBy(col("event_type"))

  val tsBurstinessSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS dt, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(c) AS BIGINT) AS sx,
      |    CAST(SUM(c * c) AS BIGINT) AS sxx
      |  FROM daily GROUP BY event_type)
      |SELECT event_type, n_days, sx, sxx,
      |  CASE WHEN sx = 0 THEN 0.0 ELSE
      |    CAST(n_days * sxx - sx * sx AS DOUBLE)
      |    / CAST(n_days * sx AS DOUBLE) END AS fano
      |FROM g ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- //

  /** SAX symbolization (Lin et al., DMKD'07) of each user's
    * hour-of-day activity profile: 24 hourly counts → PAA into 8
    * three-hour segments → per-user z-normalization → alphabet-4
    * symbols at the Gaussian breakpoints ±0.6745 / 0 → an 8-char
    * word per user. The shape index behind motif discovery and
    * whole-series clustering, with no floating comparison anywhere:
    * z_j = (8·x_j − Sx)/√(8·Sxx − Sx²) is classified by comparing
    * A_j = 8·x_j − Sx and A_j²·10⁸ against 45495025·B (0.6745² =
    * 0.45495025 exactly), all in BIGINTs. Flat series (B = 0) emit
    * all-'c'.
    *
    * Scale: two map-combinable groupBys (hour counts, then per-user
    * word assembly); the 8-segment spine is a per-user constant
    * explode, never a global structure. */
  def tsSax(s: SparkSession, dir: String): DataFrame = {
    val segs = Tables.events(s, dir)
      .select(col("user_id"), (hour(col("ts")) / 3).cast("int").as("seg"))
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("x"))
    // densify: every user gets all 8 segments (missing hours = 0)
    val spine = segs.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(lit(0), lit(7))).as("seg"))
    val dense = spine.join(segs, Seq("user_id", "seg"), "left")
      .select(col("user_id"), col("seg"),
        coalesce(col("x"), lit(0L)).as("x"))
    val stats = dense.groupBy(col("user_id")).agg(
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
    val sym = dense.join(stats, "user_id")
      .withColumn("a", lit(8L) * col("x") - col("sx"))
      .withColumn("b", lit(8L) * col("sxx") - col("sx") * col("sx"))
      .withColumn("sym",
        when(col("a") < 0 &&
          col("a") * col("a") * 100000000L > lit(45495025L) * col("b"),
          "a")
        .when(col("a") < 0, "b")
        .when(col("a") * col("a") * 100000000L <= lit(45495025L) * col("b"),
          "c")
        .otherwise("d"))
    sym.groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("seg"), col("sym")))),
        e => e.getField("sym")), "").as("word"))
      .orderBy(col("user_id"))
  }

  val tsSaxSql: String =
    """WITH segs AS (
      |  SELECT user_id, CAST(hour(ts) // 3 AS INT) AS seg,
      |    COUNT(*) AS x
      |  FROM events GROUP BY user_id, CAST(hour(ts) // 3 AS INT)),
      |spine AS (
      |  SELECT DISTINCT user_id, unnest(generate_series(0, 7)) AS seg
      |  FROM segs),
      |dense AS (
      |  SELECT s.user_id, s.seg,
      |    COALESCE(g.x, 0) AS x
      |  FROM spine s LEFT JOIN segs g
      |    ON s.user_id = g.user_id AND s.seg = g.seg),
      |stats AS (
      |  SELECT user_id, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM dense GROUP BY user_id),
      |sym AS (
      |  SELECT d.user_id, d.seg,
      |    CASE
      |      WHEN 8 * d.x - t.sx < 0 AND
      |        (8 * d.x - t.sx) * (8 * d.x - t.sx) * 100000000
      |          > 45495025 * (8 * t.sxx - t.sx * t.sx) THEN 'a'
      |      WHEN 8 * d.x - t.sx < 0 THEN 'b'
      |      WHEN (8 * d.x - t.sx) * (8 * d.x - t.sx) * 100000000
      |          <= 45495025 * (8 * t.sxx - t.sx * t.sx) THEN 'c'
      |      ELSE 'd' END AS sym
      |  FROM dense d JOIN stats t ON d.user_id = t.user_id)
      |SELECT user_id, string_agg(sym, '' ORDER BY seg) AS word
      |FROM sym GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Hampel filter over the hourly event-count series: each point is
    * compared against the MEDIAN of its 5-point window, with the
    * window's MAD (median absolute deviation) as the robust scale —
    * the spike-repair step that z-scores get wrong because a spike
    * inflates its own mean and SD. A point with |x − med| > 3·MAD is
    * flagged and repaired to the median.
    *
    * Determinism: counts are integers, the window is exactly 5 rows
    * (truncated edge windows are excluded), so median = 3rd smallest
    * — everything is `sort_array`/`element_at` BIGINT arithmetic, no
    * percentile interpolation anywhere.
    *
    * Scale: the corpus collapses to the O(hours) grid in one
    * map-combinable groupBy; the windowed array is 5 elements per
    * grid row. The unpartitioned ORDER BY h window runs on the
    * metadata-sized grid (~720 rows/month), not the corpus — at
    * multi-year spans it partitions by month with 2-row overlap. */
  def tsHampel(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("h"))
    val arr = hourly
      .withColumn("win", collect_list(col("x"))
        .over(w.rowsBetween(-2, 2)))
      .filter(size(col("win")) === 5)
    arr
      .withColumn("med", element_at(sort_array(col("win")), 3))
      .withColumn("mad", element_at(sort_array(
        transform(col("win"), v => abs(v - col("med")))), 3))
      .select(col("h"), col("x"), col("med"), col("mad"),
        when(abs(col("x") - col("med")) > lit(3L) * col("mad"), 1L)
          .otherwise(0L).as("is_outlier"),
        when(abs(col("x") - col("med")) > lit(3L) * col("mad"),
          col("med")).otherwise(col("x")).as("repaired"))
      .orderBy(col("h"))
  }

  val tsHampelSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
      |  FROM events GROUP BY date_trunc('hour', ts)),
      |arr AS (
      |  SELECT h, x,
      |    list(x) OVER (ORDER BY h
      |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS win
      |  FROM hourly),
      |m AS (
      |  SELECT h, x, list_sort(win)[3] AS med, win
      |  FROM arr WHERE len(win) = 5),
      |d AS (
      |  SELECT h, x, med,
      |    list_sort(list_transform(win, v -> abs(v - med)))[3] AS mad
      |  FROM m)
      |SELECT h, CAST(x AS BIGINT) AS x, CAST(med AS BIGINT) AS med,
      |  CAST(mad AS BIGINT) AS mad,
      |  CAST(CASE WHEN abs(x - med) > 3 * mad THEN 1 ELSE 0 END
      |    AS BIGINT) AS is_outlier,
      |  CAST(CASE WHEN abs(x - med) > 3 * mad THEN med ELSE x END
      |    AS BIGINT) AS repaired
      |FROM d ORDER BY h""".stripMargin

  /** Holt's linear-trend exponential smoothing (α = β = 0.5) over
    * the daily order-revenue series, plus a 7-day linear forecast —
    * the level+trend upgrade of [[tsEwma]]. Revenue days are exact
    * DECIMAL(18,2) sums (doubles only after the cents are fixed);
    * each recurrence step snaps level and trend to 6 dp on both
    * engines (the repo's established round-6 parity idiom), so the
    * sequential fold is bit-reproducible.
    *
    * Scale: the corpus-side work is ONE map-combinable day groupBy;
    * the recurrence itself runs over the metadata-sized daily series
    * (~2.4k points) driver-side — the Markov-chain/audit-chain
    * precedent: a linear chain of microsecond arithmetic is not
    * worth 2.4k scheduler rounds. The oracle replays the identical
    * recurrence as a recursive CTE. */
  def tsHolt(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .orderBy(col("day"))
      .select(col("rev").cast(DoubleType))
      .collect().map(_.getDouble(0))
    // Float-multiply rounding, NOT BigDecimal: DuckDB round(x,6) is
    // floor(x·10⁶ + 0.5)/10⁶ on the double (sign-peeled); BigDecimal
    // HALF_UP on the exact binary expansion drifts from it at the
    // 6th decimal over a ~2400-step recurrence (the tsHoltWinters
    // lesson — same pairing, same fix).
    def r6(x: Double): Double = {
      val y = x * 1e6
      (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
    }
    var l = days(0)
    var b = r6(days(1) - days(0))
    days.drop(1).foreach { y =>
      val l1 = r6(0.5 * y + 0.5 * (l + b))
      b = r6(0.5 * (l1 - l) + 0.5 * b)
      l = l1
    }
    import s.implicits._
    (1 to 7).map(h => (h.toLong, l, b, r6(l + h * b)))
      .toDF("h", "level", "trend", "forecast")
      .orderBy(col("h"))
  }

  val tsHoltSql: String =
    """WITH RECURSIVE days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
      |ys AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
      |    CAST(rev AS DOUBLE) AS y
      |  FROM days),
      |n AS (SELECT MAX(t) AS tmax FROM ys),
      |holt(t, l, b) AS (
      |  SELECT 1, y1.y,
      |    round(y2.y - y1.y, 6)
      |  FROM ys y1, ys y2 WHERE y1.t = 1 AND y2.t = 2
      |  UNION ALL
      |  SELECT h.t + 1,
      |    round(0.5 * ys.y + 0.5 * (h.l + h.b), 6),
      |    round(0.5 * (round(0.5 * ys.y + 0.5 * (h.l + h.b), 6) - h.l)
      |      + 0.5 * h.b, 6)
      |  FROM holt h JOIN ys ON ys.t = h.t + 1),
      |fin AS (SELECT l, b FROM holt, n WHERE holt.t = n.tmax),
      |hs AS (SELECT unnest(generate_series(1, 7)) AS h)
      |SELECT CAST(hs.h AS BIGINT) AS h, l AS level, b AS trend,
      |  round(l + hs.h * b, 6) AS forecast
      |FROM fin, hs
      |ORDER BY h""".stripMargin

  /** Forecast-residual anomaly screen: a day is anomalous when its
    * SEASONAL-NAIVE residual (revenue minus the same weekday one
    * week earlier) sits more than 3 MADs from the median residual —
    * anomaly detection on the FORECAST ERROR rather than the raw
    * level, so ordinary weekly seasonality never false-alarms (the
    * raw-level screens in dq_* flag every weekend). Residuals pair
    * by DATE ARITHMETIC (day−7 equi-join), not row offsets, so
    * calendar gaps can't misalign the lag; medians are discrete
    * histogram values; everything is exact cents BIGINTs.
    *
    * Scale: one groupBy to days, one self-join on the day key,
    * histogram windows over the bounded residual domain. */
  def tsForecastAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val resid = daily.toDF("day", "c")
      .join(daily.select(date_add(col("day"), 7).as("day"),
        col("cents").as("c7")), "day")
      .select(col("day"), (col("c") - col("c7")).as("r"))
    val n = resid.agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = resid.groupBy(col("r")).agg(count(lit(1)).as("cc"))
      .withColumn("cum", sum(col("cc")).over(w))
      .crossJoin(broadcast(n))
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("r")))
        .as("med"))
    val wd = Window.orderBy(col("adev"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = resid.crossJoin(broadcast(med))
      .select(abs(col("r") - col("med")).as("adev"))
      .groupBy(col("adev")).agg(count(lit(1)).as("cc"))
      .withColumn("cum", sum(col("cc")).over(wd))
      .crossJoin(broadcast(n))
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("adev")))
        .as("mad"))
    resid.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .filter(abs(col("r") - col("med")) > col("mad") * 3)
      .select(col("day"), col("r"), col("med"), col("mad"))
      .orderBy(col("day"))
  }

  val tsForecastAnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |resid AS (
      |  SELECT a.day, a.cents - b.cents AS r
      |  FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM resid),
      |med AS (
      |  SELECT CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN r END)
      |    AS BIGINT) AS med
      |  FROM (SELECT h.r, SUM(h.cc) OVER (ORDER BY h.r) AS cum, n.n
      |        FROM (SELECT r, COUNT(*) AS cc FROM resid GROUP BY r)
      |          h, n)),
      |mad AS (
      |  SELECT CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN adev END)
      |    AS BIGINT) AS mad
      |  FROM (SELECT h.adev, SUM(h.cc) OVER (ORDER BY h.adev) AS cum,
      |          n.n
      |        FROM (SELECT abs(r.r - med.med) AS adev, COUNT(*) AS cc
      |              FROM resid r, med GROUP BY 1) h, n))
      |SELECT r.day, r.r, med.med, mad.mad
      |FROM resid r, med, mad
      |WHERE abs(r.r - med.med) > mad.mad * 3
      |ORDER BY r.day""".stripMargin

  /** Holt–Winters ADDITIVE seasonal smoothing (period 7) — the
    * seasonal extension [[tsHolt]] deliberately omits: level reads
    * the DESEASONALIZED observation, the seasonal index re-learns
    * from each residual, and the h-step forecast adds the matching
    * seasonal back. α=β=γ=0.5, every intermediate rounded to 6dp
    * (the tsHolt determinism discipline), initialization from the
    * first two weeks (l₀ = week-1 mean, b₀ = week-over-week mean
    * slope / 7, s₀ᵢ = yᵢ − l₀ — all from EXACT decimal sums).
    *
    * Scale: identical to tsHolt — the corpus collapses to the
    * O(days) series in one groupBy; the linear recurrence then runs
    * driver-side over metadata (the Markov/audit-chain precedent),
    * and the oracle replays it as a recursive CTE carrying the
    * rolling 7-slot seasonal LIST. */
  def tsHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .orderBy(col("day"))
      .select(col("rev"))
      .collect().map(_.getDecimal(0))
    // Float-multiply rounding, NOT BigDecimal: the oracle's round()
    // computes floor(x·10⁶ + 0.5)/10⁶ on the double (sign-peeled),
    // and over ~2400 recurrence steps the exact-decimal-expansion
    // rounding drifts from it at the 6th decimal.
    def r6(x: Double): Double = {
      val y = x * 1e6
      (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
    }
    val w1 = rows.take(7).reduce(_ add _)
    val w2 = rows.slice(7, 14).reduce(_ add _)
    val l0 = r6(w1.doubleValue / 7.0)
    val b0 = r6((w2.doubleValue - w1.doubleValue) / 49.0)
    val y = rows.map(_.doubleValue)
    val seas = scala.collection.mutable.ArrayBuffer[Double]()
    (0 until 7).foreach(i => seas += r6(y(i) - l0))
    var l = l0
    var b = b0
    (8 to y.length).foreach { t =>
      val yt = y(t - 1)
      val s7 = seas(t - 8)
      val l1 = r6(0.5 * (yt - s7) + 0.5 * (l + b))
      val b1 = r6(0.5 * (l1 - l) + 0.5 * b)
      seas += r6(0.5 * (yt - l1) + 0.5 * s7)
      l = l1; b = b1
    }
    val lastSeas = seas.takeRight(7)
    import s.implicits._
    (1 to 7).map { h =>
      (h.toLong, l, b, lastSeas(h - 1),
        r6(l + h * b + lastSeas(h - 1)))
    }.toDF("h", "level", "trend", "seasonal", "forecast")
      .orderBy(col("h"))
  }

  val tsHoltWintersSql: String = {
    val l1 =
      "round(0.5 * (ys.y - h.sl[1]) + 0.5 * (h.l + h.b), 6)"
    s"""WITH RECURSIVE days AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
       |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       |ys AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
       |    CAST(rev AS DOUBLE) AS y
       |  FROM days),
       |n AS (SELECT MAX(t) AS tmax FROM ys),
       |init AS (
       |  SELECT
       |    round(CAST((SELECT SUM(CAST(y AS DECIMAL(18,2))) FROM ys
       |      WHERE t <= 7) AS DOUBLE) / 7, 6) AS l0,
       |    round((CAST((SELECT SUM(CAST(y AS DECIMAL(18,2))) FROM ys
       |      WHERE t BETWEEN 8 AND 14) AS DOUBLE)
       |      - CAST((SELECT SUM(CAST(y AS DECIMAL(18,2))) FROM ys
       |      WHERE t <= 7) AS DOUBLE)) / 49, 6) AS b0),
       |hw(t, l, b, sl) AS (
       |  SELECT 7, i.l0, i.b0,
       |    (SELECT list(round(y - i.l0, 6) ORDER BY t) FROM ys
       |     WHERE t <= 7)
       |  FROM init i
       |  UNION ALL
       |  SELECT h.t + 1,
       |    $l1,
       |    round(0.5 * ($l1 - h.l) + 0.5 * h.b, 6),
       |    list_append(h.sl[2:7],
       |      round(0.5 * (ys.y - $l1) + 0.5 * h.sl[1], 6))
       |  FROM hw h JOIN ys ON ys.t = h.t + 1),
       |fin AS (SELECT l, b, sl FROM hw, n WHERE hw.t = n.tmax),
       |hs AS (SELECT unnest(generate_series(1, 7)) AS h)
       |SELECT CAST(hs.h AS BIGINT) AS h, l AS level, b AS trend,
       |  sl[CAST(hs.h AS INTEGER)] AS seasonal,
       |  round(l + hs.h * b + sl[CAST(hs.h AS INTEGER)], 6)
       |    AS forecast
       |FROM fin, hs
       |ORDER BY h""".stripMargin
  }

  /** Row-major DTW cell expressions for two 8-long profiles bound to
    * columns `u0..u7` (the user) and `g0..g7` (the reference): cost
    * `|uᵢ − gⱼ|`, recurrence `D(i,j) = cost + min(D(i−1,j),
    * D(i,j−1), D(i−1,j−1))`. ONE generator feeds both engines —
    * Spark consumes the strings via `expr`, the oracle embeds them
    * as lateral column aliases — so the unrolled recurrences can
    * never drift apart. */
  private def dtwCells: Seq[(String, String)] =
    for { i <- 0 until 8; j <- 0 until 8 } yield {
      val cost = s"abs(u$i - g$j)"
      val cell = s"d_${i}_$j"
      val rec =
        if (i == 0 && j == 0) cost
        else if (i == 0) s"d_0_${j - 1} + $cost"
        else if (j == 0) s"d_${i - 1}_0 + $cost"
        else s"least(d_${i - 1}_$j, d_${i}_${j - 1}, " +
          s"d_${i - 1}_${j - 1}) + $cost"
      (cell, rec)
    }

  /** Dynamic-time-warping anomaly screen: each user's 8-segment
    * hourly activity profile is DTW-aligned against the GLOBAL mean
    * profile, and the 10 worst-aligned users surface — the
    * behavioral-outlier query where plain L1 over-penalizes users
    * whose shape matches the crowd but shifted in time (DTW forgives
    * the shift; the emitted `l1` column is the rigid baseline and
    * `dtw ≤ l1` always, since the diagonal path IS the L1 sum).
    * The full 8×8 recurrence is unrolled into 64 codegen'd integer
    * expressions from [[dtwCells]] — no UDF, no iteration, exact
    * BIGINT arithmetic on both engines.
    *
    * Scale: one map-side-combined groupBy builds the per-user
    * profiles (8 conditional sums — no pivot shuffle); the global
    * profile is a 1-row broadcast; the recurrence is pure projection
    * inside whole-stage codegen; the top-10 is
    * TakeOrderedAndProject. The corpus is scanned once and only
    * (user × 8) counts ever shuffle. */
  def tsDtw(s: SparkSession, dir: String): DataFrame = {
    val segAggs = (0 to 7).map(i =>
      sum(when(col("seg") === i, 1L).otherwise(0L)).as(s"u$i"))
    val prof = Tables.events(s, dir)
      .select(col("user_id"), (hour(col("ts")) / 3).cast("int").as("seg"))
      .groupBy(col("user_id"))
      .agg(segAggs.head, segAggs.tail: _*)
    val gAggs = (0 to 7).flatMap(i => Seq(
      sum(col(s"u$i")).as(s"t$i"))) :+ count(lit(1)).as("nu")
    val glob = prof.agg(gAggs.head, gAggs.tail: _*)
      .select((0 to 7).map(i =>
        expr(s"t$i div nu").as(s"g$i")): _*)
    val cells = dtwCells
    val withCells = cells.foldLeft(prof.crossJoin(broadcast(glob))) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val l1 = (0 to 7).map(i => s"abs(u$i - g$i)").mkString(" + ")
    withCells
      .select(col("user_id"), col("d_7_7").as("dtw"),
        expr(l1).as("l1"))
      .orderBy(col("dtw").desc, col("user_id"))
      .limit(10)
  }

  val tsDtwSql: String = {
    val uCols = (0 to 7).map(i =>
      s"CAST(SUM(CASE WHEN seg = $i THEN 1 ELSE 0 END) AS BIGINT) AS u$i")
      .mkString(",\n    ")
    val gCols = (0 to 7).map(i =>
      s"CAST(CAST(SUM(u$i) AS BIGINT) // nu AS BIGINT) AS g$i")
      .mkString(",\n    ")
    val cellAliases = dtwCells.map { case (n, e) => s"$e AS $n" }
      .mkString(",\n    ")
    val l1 = (0 to 7).map(i => s"abs(u$i - g$i)").mkString(" + ")
    s"""WITH prof AS (
       |  SELECT user_id,
       |    $uCols
       |  FROM (SELECT user_id, CAST(hour(ts) // 3 AS INT) AS seg
       |        FROM events)
       |  GROUP BY user_id),
       |gprof AS (
       |  SELECT
       |    $gCols
       |  FROM prof, (SELECT COUNT(*) AS nu FROM prof)
       |  GROUP BY nu),
       |cells AS (
       |  SELECT user_id,
       |    $cellAliases,
       |    $l1 AS l1
       |  FROM prof, gprof)
       |SELECT user_id, CAST(d_7_7 AS BIGINT) AS dtw,
       |  CAST(l1 AS BIGINT) AS l1
       |FROM cells
       |ORDER BY dtw DESC, user_id LIMIT 10""".stripMargin
  }

  /** OHLC bar downsampling — the finance-standard irregular→bar
    * compaction missing from the resample family: per (user, day),
    * the FIRST (open) and LAST (close) observed values by event
    * time plus min/max, with values 1e-4-snapped to exact BIGINTs.
    * Open/close are conditional aggregates over two row_numbers that
    * share ONE (user, day) exchange — no self-join back to the
    * extremal timestamp (the naive formulation joins the table to
    * its own min(ts), doubling the scan).
    *
    * Scale: one hash exchange on (user, day); both window sorts and
    * the final aggregation reuse it. Output is bounded by the
    * queried user slice × days. */
  def ohlcBars(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 100)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("v"))
    val wAsc = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val wDesc = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("ra", row_number().over(wAsc))
      .withColumn("rd", row_number().over(wDesc))
      .groupBy(col("user_id"), col("day"))
      .agg(max(when(col("ra") === 1, col("v"))).as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max(when(col("rd") === 1, col("v"))).as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("day"))
  }

  val ohlcBarsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    ts, event_id,
      |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE user_id < 100),
      |r AS (
      |  SELECT user_id, day, v,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, day
      |      ORDER BY ts, event_id) AS ra,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, day
      |      ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM e)
      |SELECT user_id, day,
      |  CAST(MAX(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open,
      |  CAST(MAX(v) AS BIGINT) AS high,
      |  CAST(MIN(v) AS BIGINT) AS low,
      |  CAST(MAX(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM r GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin

  /** Winsorization report — clip at the exact discrete p05/p95 and
    * account for the effect: the robust-preprocessing step between
    * outlier DETECTION ([[tsHampel]], dq_iqr) and modeling. Fences
    * are percentile_disc values from a cumulative VALUE histogram
    * (rank = ceil(p·n) = (n·p + 99) div 100 — always an observed
    * value, the q51 discipline, no per-row global sort); the clip
    * effect is a second conditional pass: counts clipped on each
    * side and the exact 1e-4-snapped sums before/after.
    *
    * Scale: two passes over a 1-column projection (histogram +
    * conditional sums against broadcast fences); the cumulative
    * window runs over DISTINCT values — bounded by the value domain. */
  def tsWinsorize(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir).select(
      expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("v"))
    val hist = v.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
    val fences = cum
      .agg(min(when(col("cum") >= expr("(n * 5 + 99) div 100"),
          col("v"))).as("p05"),
        min(when(col("cum") >= expr("(n * 95 + 99) div 100"),
          col("v"))).as("p95"))
    v.crossJoin(broadcast(fences))
      .agg(count(lit(1)).as("n"),
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        sum(when(col("v") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
        sum(col("v")).as("sum_raw"),
        sum(greatest(col("p05"), least(col("p95"), col("v"))))
          .as("sum_wins"))
  }

  val tsWinsorizeSql: String =
    """WITH v AS (
      |  SELECT CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
      |  FROM events),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
      |cum AS (
      |  SELECT hv.v, SUM(hv.c) OVER (ORDER BY hv.v) AS cum, n.n
      |  FROM (SELECT v, COUNT(*) AS c FROM v GROUP BY v) hv, n),
      |fences AS (
      |  SELECT
      |    CAST(MIN(CASE WHEN cum >= (n * 5 + 99) // 100 THEN v END)
      |      AS BIGINT) AS p05,
      |    CAST(MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END)
      |      AS BIGINT) AS p95
      |  FROM cum)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(p05) AS BIGINT) AS p05,
      |  CAST(MAX(p95) AS BIGINT) AS p95,
      |  CAST(SUM(CASE WHEN v.v < p05 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_lo,
      |  CAST(SUM(CASE WHEN v.v > p95 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_hi,
      |  CAST(SUM(v.v) AS BIGINT) AS sum_raw,
      |  CAST(SUM(GREATEST(p05, LEAST(p95, v.v))) AS BIGINT)
      |    AS sum_wins
      |FROM v, fences""".stripMargin

  /** Theil–Sen robust trend estimator over the monthly revenue
    * series: the MEDIAN of all pairwise slopes
    * `(rev_j − rev_i)/(month_j − month_i)`, i<j — outlier-resistant
    * where OLS (learn_linreg) is not (breakdown point 29% vs 0%).
    * Exact integer arithmetic end to end: revenue per-row-snapped to
    * cents BEFORE the sum, slopes as sign-peeled ppm divisions
    * (Spark `div` truncates, DuckDB `//` floors — they agree only on
    * non-negative operands), median as the discrete lower median via
    * a cumulative value histogram (an actual observed slope, never
    * an interpolation).
    *
    * Scale: the corpus-sized work is ONE groupBy producing the
    * O(months) series; the pair frame and its histogram are
    * O(months²) — a few thousand rows that stay constant as the
    * corpus grows (time doesn't scale with data volume), so the
    * single-partition cumulative window is metadata-sized by
    * premise. */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("mi"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val slopes = monthly.toDF("mi_a", "c_a")
      .crossJoin(broadcast(monthly.toDF("mi_b", "c_b")))
      .filter(col("mi_a") < col("mi_b"))
      .select(expr(
        """CASE WHEN c_b - c_a >= 0
          |  THEN (c_b - c_a) * 1000000L div (mi_b - mi_a)
          |  ELSE -((c_a - c_b) * 1000000L div (mi_b - mi_a))
          |END""".stripMargin).as("slope_ppm"))
    val tot = slopes.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("slope_ppm") > 0, 1L).otherwise(0L)).as("n_pos"))
    val w = Window.orderBy(col("slope_ppm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slopes.groupBy(col("slope_ppm")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= expr("(n_pairs + 1) div 2"))
      .agg(max(col("n_pairs")).as("n_pairs"),
        max(col("n_pos")).as("n_pos"),
        min(col("slope_ppm")).as("slope_med_ppm"))
  }

  val theilSenSql: String =
    """WITH m AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |sl AS (
      |  SELECT CASE WHEN b.cents - a.cents >= 0
      |    THEN (b.cents - a.cents) * 1000000 // (b.mi - a.mi)
      |    ELSE -((a.cents - b.cents) * 1000000 // (b.mi - a.mi))
      |    END AS slope_ppm
      |  FROM m a, m b WHERE a.mi < b.mi),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN slope_ppm > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_pos FROM sl),
      |cum AS (
      |  SELECT slope_ppm, SUM(cnt) OVER (ORDER BY slope_ppm) AS cum
      |  FROM (SELECT slope_ppm, COUNT(*) AS cnt FROM sl
      |        GROUP BY slope_ppm))
      |SELECT t.n_pairs, t.n_pos,
      |  CAST(MIN(c.slope_ppm) AS BIGINT) AS slope_med_ppm
      |FROM cum c, tot t WHERE c.cum >= (t.n_pairs + 1) // 2
      |GROUP BY t.n_pairs, t.n_pos""".stripMargin

  /** Kaplan–Meier survival + Nelson–Aalen cumulative hazard over
    * order time-to-ship: each (lineitem, order) pair contributes one
    * observation — duration = days from order to ship; items that
    * would ship after the fixed administrative cutoff (2001-01-01)
    * are RIGHT-CENSORED at the cutoff (the textbook construction:
    * duration = min(ship, C) − order, event = shipped ≤ C). Rows
    * with ship < order (synthetic noise) are excluded, as are orders
    * placed after the cutoff (their duration would be negative).
    *
    * Determinism: the risk table is exact integers (d, c, n_risk);
    * the Nelson–Aalen hazard accumulates exact ppm terms
    * `d·10⁶ div n` (non-negative, so div == //); the KM survival is
    * carried in LOG space — per-step ln((n−d)/n) from one fixed
    * double tree, 1e-9-snapped to longs BEFORE the cumulative sum
    * (the jsDivergence discipline; floor(x·1e9+0.5) rounds
    * identically for either sign in both engines) — so no product of
    * doubles ever crosses engines. A step where d = n_risk (survival
    * hits exactly 0) would be log-undefined and contributes 0 to the
    * log column by convention; the hazard column still records it
    * exactly.
    *
    * Scale: one equi join + one map-combinable (t) aggregate; the
    * windows run over the O(distinct durations) risk table (~2.2k
    * rows — metadata), not the corpus. */
  def tsKaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit("2001-01-01"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"),
        to_date(col("o_orderdate")).as("od"))
    val obs = li.join(ord, "l_orderkey")
      .filter(col("ship") >= col("od") && col("od") <= cutoff)
      .select(
        when(col("ship") <= cutoff, datediff(col("ship"), col("od")))
          .otherwise(datediff(cutoff, col("od")))
          .cast(LongType).as("t"),
        when(col("ship") <= cutoff, 1L).otherwise(0L).as("is_event"))
    val byT = obs.groupBy(col("t"))
      .agg(sum(col("is_event")).as("d"),
        sum(lit(1L) - col("is_event")).as("c"))
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col("t")) // O(distinct durations)
    byT
      .withColumn("total", sum(col("d") + col("c")).over(wAll))
      .withColumn("before", coalesce(
        sum(col("d") + col("c"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_risk", col("total") - col("before"))
      .withColumn("hz", expr("(d * 1000000) div n_risk"))
      .withColumn("lt",
        when(col("d") > 0 && col("n_risk") > col("d"),
          floor(log((col("n_risk") - col("d")).cast(DoubleType)
              / col("n_risk").cast(DoubleType)) * 1e9 + 0.5)
            .cast(LongType))
          .otherwise(0L))
      .withColumn("cum_hazard_ppm", sum(col("hz"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("log_surv_e9", sum(col("lt"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t"), col("n_risk"), col("d").as("events"),
        col("c").as("censored"), col("cum_hazard_ppm"),
        col("log_surv_e9"))
      .orderBy(col("t"))
  }

  val tsKaplanMeierSql: String =
    """WITH obs AS (
      |  SELECT CASE WHEN CAST(l_shipdate AS DATE) <= DATE '2001-01-01'
      |      THEN datediff('day', CAST(o_orderdate AS DATE),
      |                    CAST(l_shipdate AS DATE))
      |      ELSE datediff('day', CAST(o_orderdate AS DATE),
      |                    DATE '2001-01-01') END AS t,
      |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '2001-01-01'
      |      THEN 1 ELSE 0 END AS is_event
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
      |    AND CAST(o_orderdate AS DATE) <= DATE '2001-01-01'),
      |byt AS (
      |  SELECT CAST(t AS BIGINT) AS t,
      |    CAST(SUM(is_event) AS BIGINT) AS d,
      |    CAST(SUM(1 - is_event) AS BIGINT) AS c
      |  FROM obs GROUP BY t),
      |risk AS (
      |  SELECT t, d, c,
      |    CAST(SUM(d + c) OVER () -
      |      COALESCE(SUM(d + c) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS n_risk
      |  FROM byt),
      |terms AS (
      |  SELECT t, n_risk, d, c,
      |    (d * 1000000) // n_risk AS hz,
      |    CASE WHEN d > 0 AND n_risk > d THEN
      |      CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
      |        / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
      |      ELSE 0 END AS lt
      |  FROM risk)
      |SELECT t, n_risk, d AS events, c AS censored,
      |  CAST(SUM(hz) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_hazard_ppm,
      |  CAST(SUM(lt) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS log_surv_e9
      |FROM terms ORDER BY t""".stripMargin

  /** Local-level Kalman filter (Harvey's structural form: random-walk
    * state, observation noise) over the daily order-revenue series —
    * the optimal-in-quadratic-loss online smoother, the principled
    * upgrade of [[tsEwma]] whose gain ADAPTS instead of being fixed.
    * Fixed variances q = 0.5 (process), r = 2.0 (observation),
    * diffuse start (level = y₁, P = 1). Per step: P⁺ = P + q,
    * K = P⁺/(P⁺+r), level += K·(y − level), P = (1−K)·P⁺ — gain,
    * level and variance each snapped to 6 dp with float-multiply
    * rounding (the [[tsHoltWinters]] pairing with DuckDB round(x,6)),
    * so the ~2.4k-step recurrence is bit-reproducible.
    *
    * Scale: corpus work is ONE map-combinable day groupBy; the
    * recurrence folds the metadata-sized daily series driver-side
    * (the tsHolt/Markov-chain precedent) while the oracle replays it
    * as a recursive CTE. Emits the last 7 filtered days. */
  def tsKalman(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .orderBy(col("day"))
      .select(col("rev").cast(DoubleType))
      .collect().map(_.getDouble(0))
    def r6(x: Double): Double = {
      val y = x * 1e6
      (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
    }
    val (q, r) = (0.5, 2.0)
    var level = days(0)
    var p = 1.0
    val states = Array.newBuilder[(Long, Double, Double, Double)]
    states += ((1L, level, 0.0, p))
    days.zipWithIndex.drop(1).foreach { case (y, i) =>
      val pp = p + q
      val k = r6(pp / (pp + r))
      level = r6(level + k * (y - level))
      p = r6((1.0 - k) * pp)
      states += (((i + 1).toLong, level, k, p))
    }
    import s.implicits._
    states.result().takeRight(7).toSeq
      .toDF("t", "level", "gain", "variance")
      .orderBy(col("t"))
  }

  val tsKalmanSql: String =
    """WITH RECURSIVE days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
      |ys AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
      |    CAST(rev AS DOUBLE) AS y
      |  FROM days),
      |n AS (SELECT MAX(t) AS tmax FROM ys),
      |kal(t, l, g, p) AS (
      |  SELECT 1, y, CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
      |  FROM ys WHERE t = 1
      |  UNION ALL
      |  SELECT k.t + 1,
      |    round(k.l + round((k.p + 0.5) / (k.p + 0.5 + 2.0), 6)
      |      * (ys.y - k.l), 6),
      |    round((k.p + 0.5) / (k.p + 0.5 + 2.0), 6),
      |    round((1.0 - round((k.p + 0.5) / (k.p + 0.5 + 2.0), 6))
      |      * (k.p + 0.5), 6)
      |  FROM kal k JOIN ys ON ys.t = k.t + 1),
      |fin AS (SELECT * FROM kal, n WHERE kal.t > n.tmax - 7)
      |SELECT CAST(t AS BIGINT) AS t, l AS level, g AS gain,
      |  p AS variance
      |FROM fin ORDER BY t""".stripMargin

  /** Granger-causality screen (Granger 1969) at lag 1 between two
    * behavioral series — does yesterday's CLICK volume improve
    * today's PURCHASE-volume forecast beyond purchase's own history?
    * Daily value sums per type are EXACT decimal aggregates; the two
    * OLS fits (restricted: own lag; unrestricted: own + cross lag)
    * are closed-form over centered power sums — Cramer's rule on the
    * 2×2 normal equations, no iterative solver — in ONE fixed double
    * tree per emitted figure, each 1e-6-snapped (the dqChi2
    * discipline). Emits n, both unrestricted betas, both RSS and the
    * F statistic (RSS_r − RSS_u)/(RSS_u/(n−3)).
    *
    * Scale: the corpus collapses to O(days) rows in one
    * map-combinable aggregate; the lag alignment and power sums run
    * on that metadata-sized series. */
  def tsGranger(s: SparkSession, dir: String): DataFrame = {
    val z = lit(0).cast(DecimalType(18, 4))
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 4)))), z).as("py"),
        coalesce(sum(when(col("event_type") === "click",
          col("value").cast(DecimalType(18, 4)))), z).as("cx"))
    val w = Window.orderBy(col("day")) // O(days) series
    val lagged = daily
      .withColumn("d", col("py"))
      .withColumn("u", lag(col("py"), 1).over(w))
      .withColumn("v", lag(col("cx"), 1).over(w))
      .filter(col("u").isNotNull)
    // power sums stay EXACT decimals through the aggregate (double
    // sums don't commute across partitions); each is cast to double
    // ONCE, then every figure is one fixed IEEE tree, e6-snapped
    val sums = lagged.agg(
        count(lit(1)).as("n"),
        sum(col("d")).as("sd"), sum(col("u")).as("su"),
        sum(col("v")).as("sv"),
        sum(col("d") * col("d")).as("sdd"),
        sum(col("u") * col("u")).as("suu"),
        sum(col("v") * col("v")).as("svv"),
        sum(col("d") * col("u")).as("sdu"),
        sum(col("d") * col("v")).as("sdv"),
        sum(col("u") * col("v")).as("suv"))
      .select(col("n").cast(DoubleType).as("n"),
        col("sd").cast(DoubleType).as("sd"),
        col("su").cast(DoubleType).as("su"),
        col("sv").cast(DoubleType).as("sv"),
        col("sdd").cast(DoubleType).as("sdd"),
        col("suu").cast(DoubleType).as("suu"),
        col("svv").cast(DoubleType).as("svv"),
        col("sdu").cast(DoubleType).as("sdu"),
        col("sdv").cast(DoubleType).as("sdv"),
        col("suv").cast(DoubleType).as("suv"))
    sums.select((col("n").cast(LongType).as("n") +:
      grangerFigures.map { case (name, f) =>
        expr(s"CAST(floor(($f) * 1e6 + 0.5) AS BIGINT)").as(name)
      }): _*)
  }

  /** The Granger figures as SQL-text formula fragments over the ten
    * double power sums — interpolated into BOTH the Spark `expr` and
    * the DuckDB oracle, so the IEEE expression trees are identical
    * by construction. */
  private val grangerFigures: Seq[(String, String)] = {
    val cd = "(sdd - sd*sd/n)"
    val cu = "(suu - su*su/n)"
    val cv = "(svv - sv*sv/n)"
    val cdu = "(sdu - sd*su/n)"
    val cdv = "(sdv - sd*sv/n)"
    val cuv = "(suv - su*sv/n)"
    val det = s"($cu*$cv - $cuv*$cuv)"
    val bOwn = s"(($cdu*$cv - $cdv*$cuv) / $det)"
    val bCross = s"(($cdv*$cu - $cdu*$cuv) / $det)"
    val rssR = s"($cd - $cdu*$cdu/$cu)"
    val rssU = s"($cd - ($bOwn*$cdu + $bCross*$cdv))"
    val f = s"(($rssR - $rssU) / ($rssU / (n - 3)))"
    Seq("beta_own_e6" -> bOwn, "beta_cross_e6" -> bCross,
      "rss_r_e6" -> rssR, "rss_u_e6" -> rssU, "f_e6" -> f)
  }

  val tsGrangerSql: String = {
    val figs = grangerFigures.map { case (name, f) =>
      s"CAST(floor(($f) * 1e6 + 0.5) AS BIGINT) AS $name"
    }.mkString(",\n      |  ")
    s"""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,4)) END),
      |      CAST(0 AS DECIMAL(18,4))) AS py,
      |    COALESCE(SUM(CASE WHEN event_type = 'click'
      |      THEN CAST(value AS DECIMAL(18,4)) END),
      |      CAST(0 AS DECIMAL(18,4))) AS cx
      |  FROM events GROUP BY 1),
      |lagged AS (
      |  SELECT py AS d,
      |    LAG(py) OVER (ORDER BY day) AS u,
      |    LAG(cx) OVER (ORDER BY day) AS v
      |  FROM daily),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(d) AS DOUBLE) AS sd, CAST(SUM(u) AS DOUBLE) AS su,
      |    CAST(SUM(v) AS DOUBLE) AS sv,
      |    CAST(SUM(d*d) AS DOUBLE) AS sdd,
      |    CAST(SUM(u*u) AS DOUBLE) AS suu,
      |    CAST(SUM(v*v) AS DOUBLE) AS svv,
      |    CAST(SUM(d*u) AS DOUBLE) AS sdu,
      |    CAST(SUM(d*v) AS DOUBLE) AS sdv,
      |    CAST(SUM(u*v) AS DOUBLE) AS suv
      |  FROM lagged WHERE u IS NOT NULL)
      |SELECT CAST(n AS BIGINT) AS n,
      |  $figs
      |FROM sums""".stripMargin
  }

  /** Diurnal DFT power spectrum — the frequency-domain view of
    * [[tsSeasonality]]: goodness of k cycles/day for k = 1..4 over
    * the hour-of-day count profile per event type,
    * `P_k = A_k² + B_k²` with `A_k = Σ_t x_t·cos(2πkt/24)` (and sin
    * for B). The trig factors are FROZEN SHARED LITERALS — computed
    * once in Scala and interpolated into BOTH engines' SQL (the ewma
    * frozen-weights discipline), so no libm cos/sin difference can
    * ever reach the hash; per-term products are e6-snapped longs
    * summed exactly, and the final square is one double tree.
    *
    * Scale: one map-combinable (type, hour) count; the transform
    * runs on the O(types × 24) grid. */
  def tsSpectrum(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast(LongType).as("hod"))
      .agg(count(lit(1)).as("x"))
    val ks = Seq(1, 2, 3, 4)
    def lits(f: Int => Double): String =
      (0 until 24).map(t => f(t).toString).mkString("array(", ", ", ")")
    val terms = ks.map { k =>
      val cosA = lits(t => math.cos(2.0 * math.Pi * k * t / 24.0))
      val sinA = lits(t => math.sin(2.0 * math.Pi * k * t / 24.0))
      (k,
        s"CAST(floor(x * element_at($cosA, CAST(hod AS INT) + 1)" +
          s" * 1e6 + 0.5) AS BIGINT)",
        s"CAST(floor(x * element_at($sinA, CAST(hod AS INT) + 1)" +
          s" * 1e6 + 0.5) AS BIGINT)")
    }
    val perK = terms.map { case (k, ce, se) =>
      grid.select(col("event_type"), lit(k.toLong).as("k"),
        expr(ce).as("ct"), expr(se).as("st"))
    }.reduce(_ unionByName _)
    perK.groupBy(col("event_type"), col("k"))
      .agg(sum(col("ct")).as("a_e6"), sum(col("st")).as("b_e6"))
      .select(col("event_type"), col("k"), col("a_e6"), col("b_e6"),
        expr("CAST(floor((CAST(a_e6 AS DOUBLE) * CAST(a_e6 AS DOUBLE)" +
          " + CAST(b_e6 AS DOUBLE) * CAST(b_e6 AS DOUBLE)) / 1e12" +
          " + 0.5) AS BIGINT)").as("power"))
      .orderBy(col("event_type"), col("k"))
  }

  val tsSpectrumSql: String = {
    def lits(f: Int => Double): String =
      (0 until 24).map(t => f(t).toString).mkString("[", ", ", "]")
    val ks = Seq(1, 2, 3, 4)
    val arms = ks.map { k =>
      val cosA = lits(t => math.cos(2.0 * math.Pi * k * t / 24.0))
      val sinA = lits(t => math.sin(2.0 * math.Pi * k * t / 24.0))
      s"""  SELECT event_type, CAST($k AS BIGINT) AS k,
         |    CAST(floor(x * ($cosA)[CAST(hod AS INTEGER) + 1]
         |      * 1e6 + 0.5) AS BIGINT) AS ct,
         |    CAST(floor(x * ($sinA)[CAST(hod AS INTEGER) + 1]
         |      * 1e6 + 0.5) AS BIGINT) AS st
         |  FROM grid""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH grid AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
      |    COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |terms AS (
      |$arms)
      |SELECT event_type, k,
      |  CAST(SUM(ct) AS BIGINT) AS a_e6,
      |  CAST(SUM(st) AS BIGINT) AS b_e6,
      |  CAST(floor((CAST(SUM(ct) AS DOUBLE) * CAST(SUM(ct) AS DOUBLE)
      |    + CAST(SUM(st) AS DOUBLE) * CAST(SUM(st) AS DOUBLE)) / 1e12
      |    + 0.5) AS BIGINT) AS power
      |FROM terms GROUP BY event_type, k
      |ORDER BY event_type, k""".stripMargin
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) over the
    * monthly revenue series — the SIGNIFICANCE companion of
    * [[theilSen]] (Sen gives the slope, MK says whether a monotone
    * trend exists at all): S = Σ_{i<j} sign(x_j − x_i) in exact
    * integers from the same cents-exact monthly frame, the tie-
    * corrected variance `18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`
    * kept as an exact BIGINT (×18 so no division ever happens), and
    * the continuity-corrected Z = (S ∓ 1)/√Var as one snapped double
    * tree.
    *
    * Scale: the corpus collapses to O(months) in one map-combinable
    * aggregate; the pair stage is the bounded months² broadcast
    * cross join (the theilSen/kendall precedent — ~80² pairs is
    * metadata; a merge-sort S computation swaps in for unbounded
    * series, same outputs). */
  def tsMannKendall(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("mi"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val pairs = monthly.toDF("mi_a", "c_a")
      .crossJoin(broadcast(monthly.toDF("mi_b", "c_b")))
      .filter(col("mi_a") < col("mi_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("c_b") > col("c_a"), 1L).otherwise(0L)).as("p"),
        sum(when(col("c_b") < col("c_a"), 1L).otherwise(0L)).as("m"))
    val nRow = monthly.agg(count(lit(1)).as("n"))
    val ties = monthly.groupBy(col("cents"))
      .agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie_term"))
    pairs.crossJoin(broadcast(nRow)).crossJoin(broadcast(ties))
      .select(col("n"), col("n_pairs"), (col("p") - col("m")).as("s"),
        expr("n * (n - 1) * (2 * n + 5) - tie_term").as("var18"))
      .select(col("n"), col("n_pairs"), col("s"), col("var18"),
        expr("CASE WHEN s = 0 THEN 0 ELSE CAST(floor(" +
          "(CAST(s AS DOUBLE) - CAST(SIGN(s) AS DOUBLE))" +
          " / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6 + 0.5)" +
          " AS BIGINT) END").as("z_e6"))
  }

  val tsMannKendallSql: String =
    """WITH m AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |pairs AS (
      |  SELECT COUNT(*) AS n_pairs,
      |    CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p,
      |    CAST(SUM(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m
      |  FROM m a, m b WHERE a.mi < b.mi),
      |nn AS (SELECT COUNT(*) AS n FROM m),
      |ties AS (
      |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
      |    AS BIGINT) AS tie_term
      |  FROM (SELECT COUNT(*) AS t FROM m GROUP BY cents)),
      |f AS (
      |  SELECT nn.n, pairs.n_pairs, pairs.p - pairs.m AS s,
      |    nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS var18
      |  FROM pairs, nn, ties)
      |SELECT n, n_pairs, s, CAST(var18 AS BIGINT) AS var18,
      |  CASE WHEN s = 0 THEN 0 ELSE CAST(floor(
      |    (CAST(s AS DOUBLE) - CAST(SIGN(s) AS DOUBLE))
      |    / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6 + 0.5)
      |    AS BIGINT) END AS z_e6
      |FROM f""".stripMargin

  /** Ljung–Box portmanteau test (Ljung & Box 1978) over the daily
    * order-revenue series: sample autocorrelations ρ_k for lags
    * 1..7 and Q = n(n+2)·Σ ρ_k²/(n−k) — "is there ANY linear
    * structure left", the residual-whiteness check run after every
    * forecast fit ([[tsHolt]]/[[tsHoltWinters]]'s missing
    * diagnosis). Deviations come from exact decimal day sums; each
    * ρ_k is one fixed double tree over a lag-k product sum
    * e9-snapped; Q sums the snapped terms exactly and re-snaps once.
    *
    * Scale: one map-combinable day aggregate; the 7 lag joins run
    * on the O(days) series keyed by day index — metadata. */
  def tsLjungBox(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val w = Window.orderBy(col("day")) // O(days)
    val idx = daily.withColumn("t", row_number().over(w).cast(LongType))
      .select(col("t"), col("rev"))
    val base = idx.agg(count(lit(1)).as("n"), sum(col("rev")).as("sr"),
      sum(col("rev") * col("rev")).as("srr"))
    // lag join as an EQUI join: each row fans out to its 7 lag
    // targets (t+k), so the pair stage is hash-joinable — no
    // nested-loop range join even at unbounded series length
    val lags = idx.toDF("t", "ra")
      .withColumn("k", explode(sequence(lit(1L), lit(7L))))
      .withColumn("t2", col("t") + col("k"))
      .join(idx.toDF("t2", "rb"), "t2")
      .select(col("k"), (col("ra") * col("rb")).as("prod"))
      .groupBy(col("k")).agg(sum(col("prod")).as("sxy"))
    val rho = lags.crossJoin(broadcast(base))
      .select(col("k"),
        expr("CAST(floor(" +
          "(CAST(sxy AS DOUBLE) - CAST(n - k AS DOUBLE)" +
          "   * (CAST(sr AS DOUBLE)/CAST(n AS DOUBLE))" +
          "   * (CAST(sr AS DOUBLE)/CAST(n AS DOUBLE)))" +
          " / (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)" +
          "   * CAST(sr AS DOUBLE)/CAST(n AS DOUBLE))" +
          " * 1e9 + 0.5) AS BIGINT)").as("rho_e9"),
        col("n"))
    rho
      .withColumn("term9", expr(
        "CAST(floor(CAST(rho_e9 AS DOUBLE) * CAST(rho_e9 AS DOUBLE)" +
          " / 1e9 / CAST(n - k AS DOUBLE) + 0.5) AS BIGINT)"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_lags"), sum(col("term9")).as("tsum9"))
      .select(col("n").cast(LongType).as("n"), col("n_lags"),
        expr("CAST(floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)" +
          " * CAST(tsum9 AS DOUBLE) / 1e9 * 1e6 + 0.5) AS BIGINT)")
          .as("q_e6"))
  }

  val tsLjungBoxSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    rev
      |  FROM daily),
      |base AS (
      |  SELECT COUNT(*) AS n, SUM(rev) AS sr, SUM(rev * rev) AS srr
      |  FROM idx),
      |lags AS (
      |  SELECT b.t - a.t AS k, SUM(a.rev * b.rev) AS sxy
      |  FROM idx a JOIN idx b
      |    ON b.t - a.t BETWEEN 1 AND 7
      |  GROUP BY b.t - a.t),
      |rho AS (
      |  SELECT k,
      |    CAST(floor(
      |      (CAST(sxy AS DOUBLE) - CAST(n - k AS DOUBLE)
      |         * (CAST(sr AS DOUBLE)/CAST(n AS DOUBLE))
      |         * (CAST(sr AS DOUBLE)/CAST(n AS DOUBLE)))
      |      / (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
      |         * CAST(sr AS DOUBLE)/CAST(n AS DOUBLE))
      |      * 1e9 + 0.5) AS BIGINT) AS rho_e9,
      |    n
      |  FROM lags, base),
      |terms AS (
      |  SELECT n, rho_e9,
      |    CAST(floor(CAST(rho_e9 AS DOUBLE) * CAST(rho_e9 AS DOUBLE)
      |      / 1e9 / CAST(n - k AS DOUBLE) + 0.5) AS BIGINT) AS term9
      |  FROM rho)
      |SELECT CAST(n AS BIGINT) AS n, COUNT(*) AS n_lags,
      |  CAST(floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
      |    * CAST(SUM(term9) AS DOUBLE) / 1e9 * 1e6 + 0.5) AS BIGINT)
      |    AS q_e6
      |FROM terms GROUP BY n""".stripMargin

  /** Forecast accuracy metrics for the [[tsForecastSnaive]] baseline:
    * MAE (exact cents), WAPE (Σ|a−f| / Σa as exact ppm), and sMAPE
    * (per-day 2|a−f|/(a+f) terms 1e-9-snapped BEFORE the mean) over
    * the daily revenue series paired with its own value one week
    * earlier — the scorecard a forecasting pipeline publishes next
    * to every model. Every numerator/denominator is an exact
    * decimal-cents BIGINT; divisions happen once, at the end.
    *
    * Scale: one map-combinable day aggregate + one date-arithmetic
    * equi self-join on the O(days) frame. */
  def tsForecastMetrics(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val paired = daily.toDF("day", "a")
      .join(daily.select(date_add(col("day"), 7).as("day"),
        col("cents").as("f")), "day")
    paired
      .select(col("a"), col("f"),
        abs(col("a") - col("f")).as("err"),
        expr("CAST(floor(2.0 * CAST(abs(a - f) AS DOUBLE)" +
          " / CAST(a + f AS DOUBLE) * 1e9 + 0.5) AS BIGINT)")
          .as("sm9"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("err")).as("sum_err"), sum(col("a")).as("sum_a"),
        sum(col("sm9")).as("sm9s"))
      .select(col("n_days"),
        expr("sum_err div n_days").as("mae_cents"),
        expr("(sum_err * 1000000) div sum_a").as("wape_ppm"),
        expr("CAST(floor(CAST(sm9s AS DOUBLE)" +
          " / CAST(n_days AS DOUBLE) / 1e9 * 1e6 + 0.5) AS BIGINT)")
          .as("smape_ppm"))
  }

  val tsForecastMetricsSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |paired AS (
      |  SELECT a.cents AS a, f.cents AS f
      |  FROM daily a JOIN daily f ON a.day = f.day + INTERVAL 7 DAY),
      |terms AS (
      |  SELECT a, f, abs(a - f) AS err,
      |    CAST(floor(2.0 * CAST(abs(a - f) AS DOUBLE)
      |      / CAST(a + f AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS sm9
      |  FROM paired)
      |SELECT COUNT(*) AS n_days,
      |  CAST(SUM(err) AS BIGINT) // COUNT(*) AS mae_cents,
      |  (CAST(SUM(err) AS BIGINT) * 1000000)
      |    // CAST(SUM(a) AS BIGINT) AS wape_ppm,
      |  CAST(floor(CAST(SUM(sm9) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    / 1e9 * 1e6 + 0.5) AS BIGINT) AS smape_ppm
      |FROM terms""".stripMargin

  /** Seasonal STRENGTH (Hyndman's FPP measure, eta² form): how much
    * of the (day, hour) count series' variance the hour-of-day
    * profile explains, per event type —
    * `F_s = SSB/SST = (Σ_h (Σx_h)²/n_h − (Σx)²/n) / (Σx² − (Σx)²/n)`.
    * Cell counts are exact integers; each hod's between-group term
    * is one fixed double tree 1e-6-snapped BEFORE the sum; the final
    * ratio snaps once to ppm.
    *
    * Scale: one map-combinable (type, day, hod) count, one (type,
    * hod) reduce, then O(types × 24) arithmetic. */
  def tsSeasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("x"))
    val tot = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val hods = cells.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("nh"), sum(col("x")).as("sxh"))
      .withColumn("bterm6", expr(
        "CAST(floor(CAST(sxh AS DOUBLE) * CAST(sxh AS DOUBLE)" +
          " / CAST(nh AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(sum(col("bterm6")).as("bsum6"))
    tot.join(hods, "event_type")
      .select(col("event_type"), col("n"), col("sx"),
        expr("CAST(floor(" +
          "(CAST(bsum6 AS DOUBLE) / 1e6" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
          "   / CAST(n AS DOUBLE))" +
          " / (CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
          "   / CAST(n AS DOUBLE))" +
          " * 1e6 + 0.5) AS BIGINT)").as("strength_ppm"))
      .orderBy(col("event_type"))
  }

  val tsSeasonalStrengthSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hod,
      |    COUNT(*) AS x
      |  FROM events GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM cells GROUP BY event_type),
      |hods AS (
      |  SELECT event_type,
      |    CAST(SUM(bterm6) AS BIGINT) AS bsum6
      |  FROM (
      |    SELECT event_type,
      |      CAST(floor(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
      |        / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
      |        AS bterm6
      |    FROM cells GROUP BY event_type, hod)
      |  GROUP BY event_type)
      |SELECT t.event_type, t.n, t.sx,
      |  CAST(floor(
      |    (CAST(h.bsum6 AS DOUBLE) / 1e6
      |     - CAST(t.sx AS DOUBLE) * CAST(t.sx AS DOUBLE)
      |       / CAST(t.n AS DOUBLE))
      |    / (CAST(t.sxx AS DOUBLE)
      |     - CAST(t.sx AS DOUBLE) * CAST(t.sx AS DOUBLE)
      |       / CAST(t.n AS DOUBLE))
      |    * 1e6 + 0.5) AS BIGINT) AS strength_ppm
      |FROM tot t JOIN hods h ON h.event_type = t.event_type
      |ORDER BY t.event_type""".stripMargin

  /** Maximum drawdown over the cumulative-revenue curve — the
    * worst peak-to-trough loss an equity/health-metric monitor
    * reports: with C_t the running total and P_t its running max,
    * drawdown_t = P_t − C_t (exact cents) and the gate emits the
    * max drawdown, its depth in ppm of the peak, and the day it
    * bottomed (earliest on ties). Daily deltas here are net revenue
    * minus a fixed burn (the mean), so the curve actually goes
    * down — a pure cumsum of positives has zero drawdown by
    * construction.
    *
    * Scale: one map-combinable day aggregate; the two cumulative
    * windows run over the O(days) series. */
  def tsDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = daily
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("cents")).over(wAll))
      // net = cents − mean (floor); exact integers, same both engines
      .withColumn("net", col("cents") - expr("tot div n"))
      .withColumn("c", sum(col("net")).over(wCum))
      .withColumn("peak", max(col("c")).over(wCum))
      .withColumn("dd", col("peak") - col("c"))
    val wPick = Window.orderBy(col("dd").desc, col("day"))
    curve
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("day").as("trough_day"), col("peak"), col("c"),
        col("dd").as("max_drawdown"),
        when(col("peak") > 0,
          expr("(dd * 1000000) div peak")).as("depth_ppm"))
  }

  val tsDrawdownSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |net AS (
      |  SELECT day,
      |    cents - CAST(SUM(cents) OVER () AS BIGINT)
      |      // CAST(COUNT(*) OVER () AS BIGINT) AS net
      |  FROM daily),
      |curve AS (
      |  SELECT day,
      |    CAST(SUM(net) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS c
      |  FROM net),
      |dd AS (
      |  SELECT day, c,
      |    CAST(MAX(c) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS peak
      |  FROM curve),
      |pick AS (
      |  SELECT day, peak, c, peak - c AS dd,
      |    row_number() OVER (ORDER BY peak - c DESC, day) AS rk
      |  FROM dd)
      |SELECT day AS trough_day, peak, c, dd AS max_drawdown,
      |  CASE WHEN peak > 0 THEN (dd * 1000000) // peak END
      |    AS depth_ppm
      |FROM pick WHERE rk = 1""".stripMargin

  /** The per-lag ACF figure as shared SQL text over the exact sums:
    * r(k) = (Σ head·tail − x̄·(Σhead + Σtail) + m·x̄²) / Σ(x − x̄)²
    * with x̄ = s/n and the denominator in its n-scaled closed form.
    * `m` = n − k pairs. One fixed double tree per lag, e6-snapped. */
  private def acfFigure(k: Int): String = {
    val m = s"(n - $k)"
    val xbar = "(s / n)"
    s"((sxy$k - $xbar * (sh$k + st$k) + $m * $xbar * $xbar)" +
      s" / ((sq - s * s / n)))"
  }

  /** Autocorrelation function table, lags 1..14, over the daily
    * order-revenue series — the Box–Jenkins identification
    * diagnostic ([[tsAutocorr]] is the lag-1 point; [[tsLjungBox]]
    * tests the first 7 jointly; this emits the CURVE with the
    * ±1.96/√n significance band). Convention: global mean and
    * global-variance denominator (the standard ACF estimator), over
    * the observed-day sequence.
    *
    * Determinism: all sums are exact DECIMAL aggregates cast to
    * double once; each r(k) is ONE shared-text double tree
    * ([[tsGranger]]'s discipline), e6-snapped; the significance
    * bound cross-multiplies against 1.96²·1e12 in the snapped
    * integers, so no sqrt crosses engines.
    *
    * Scale: ONE corpus reduce to O(days), 14 lead columns on one
    * window sort, ONE aggregate row carrying 3·14 + 3 sums — no
    * joins, no per-lag passes. */
  def tsAcf(s: SparkSession, dir: String, maxLag: Int = 14)
      : DataFrame = {
    val days = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .as("rev"))
    val wOrd = Window.orderBy(col("day")) // O(days) series
    val leads = (1 to maxLag).map(k =>
      lead(col("rev"), k).over(wOrd).as(s"l$k"))
    val lagged = days.select((col("rev") +: leads): _*)
    val perLag = (1 to maxLag).flatMap { k =>
      Seq(
        sum((col("rev") * col(s"l$k")).cast(DecimalType(38, 4)))
          .cast(DoubleType).as(s"sxy$k"),
        sum(when(col(s"l$k").isNotNull, col("rev"))
          .cast(DecimalType(38, 4))).cast(DoubleType).as(s"sh$k"),
        sum(col(s"l$k").cast(DecimalType(38, 4)))
          .cast(DoubleType).as(s"st$k"))
    }
    val aggCols: Seq[org.apache.spark.sql.Column] = Seq(
      sum(col("rev").cast(DecimalType(38, 4)))
        .cast(DoubleType).as("s"),
      sum((col("rev") * col("rev")).cast(DecimalType(38, 4)))
        .cast(DoubleType).as("sq")) ++ perLag
    val sums = lagged.agg(
      count(lit(1)).cast(DoubleType).as("n"), aggCols: _*)
      .localCheckpoint() // one row; two consumers (lags + the band)
    val rows = (1 to maxLag).map { k =>
      s"struct(CAST($k AS BIGINT) AS lag," +
        s" CAST(n - $k AS BIGINT) AS n_pairs," +
        s" CAST(floor(${acfFigure(k)} * 1e6 + 0.5) AS BIGINT)" +
        s" AS r_e6)"
    }.mkString(", ")
    sums
      .select(expr(s"explode(array($rows))").as("x"))
      .select(col("x.lag"), col("x.n_pairs"), col("x.r_e6"))
      .crossJoin(broadcast(sums.select(col("n"))))
      // |r| > 1.96/√n ⇔ r_e6² · n > 1.96² · 1e12, exact integers
      .withColumn("significant",
        col("r_e6") * col("r_e6") * col("n").cast(LongType)
          > lit(3841600000000L))
      .drop("n")
      .orderBy(col("lag"))
  }

  def tsAcfSql(maxLag: Int = 14): String = {
    val leadDefs = (1 to maxLag).map(k =>
      s"lead(rev, $k) OVER (ORDER BY day) AS l$k").mkString(",\n      |    ")
    val sumDefs = (1 to maxLag).map { k =>
      s"CAST(SUM(CAST(rev * l$k AS DECIMAL(38,4))) AS DOUBLE) AS sxy$k,\n" +
        s"      |    CAST(SUM(CAST(CASE WHEN l$k IS NOT NULL THEN rev" +
        s" END AS DECIMAL(38,4))) AS DOUBLE) AS sh$k,\n" +
        s"      |    CAST(SUM(CAST(l$k AS DECIMAL(38,4))) AS DOUBLE)" +
        s" AS st$k"
    }.mkString(",\n      |    ")
    val rowSelects = (1 to maxLag).map { k =>
      s"SELECT CAST($k AS BIGINT) AS lag," +
        s" CAST(n - $k AS BIGINT) AS n_pairs," +
        s" CAST(floor(${acfFigure(k)} * 1e6 + 0.5) AS BIGINT) AS r_e6," +
        s" n FROM sums"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |lagged AS (
      |  SELECT rev,
      |    $leadDefs
      |  FROM days),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(rev AS DECIMAL(38,4))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE) AS sq,
      |    $sumDefs
      |  FROM lagged),
      |rows_ AS (
      |  $rowSelects)
      |SELECT lag, n_pairs, r_e6,
      |  r_e6 * r_e6 * CAST(n AS BIGINT) > 3841600000000 AS significant
      |FROM rows_ ORDER BY lag""".stripMargin
  }

  /** Matrix profile (Yeh et al., "Matrix Profile I", ICDM 2016) over
    * the daily order-revenue series — for every length-7 window, the
    * distance to its nearest NON-TRIVIAL match anywhere in the
    * series and that match's position. Low profile points are motifs
    * (repeated structure), the peaks are discords (the series' most
    * anomalous week) — THE modern time-series-mining primitive.
    * Distance is plain squared Euclidean over exact $10-granular
    * integers (cents floor-div 1000 — non-negative, so the engines'
    * integer divisions agree; the rescale keeps Σ7 diff² under 2⁶³
    * through 100× the sf0.1 daily volume), so profile AND index are
    * hash-exact; the exclusion zone |i − j| ≥ 3 (⌊m/2⌋, the paper's
    * convention) removes trivial self-matches; argmin ties break to
    * the smaller j.
    *
    * Scale: the series is O(calendar days) METADATA by premise (the
    * corpus collapses through one map-combinable day reduce —
    * n ≈ 2.4k regardless of SF, so the all-pairs stage is ~5.7M
    * tiny codegen rows, embarrassingly parallel). Fleet scale comes
    * from many SERIES, each bounded — per-entity profiles reuse this
    * shape partitioned by key; a single unbounded series swaps in
    * the STOMP recurrence, plan shape unchanged. */
  def tsMatrixProfile(s: SparkSession, dir: String, m: Int = 7)
      : DataFrame = {
    val days = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))" +
        " * 100 AS BIGINT) div 1000 AS BIGINT)").as("v"))
    val wOrd = Window.orderBy(col("day")) // O(days) series
    // The window as m EXPLICIT lead columns, not an array: the
    // per-pair distance then codegens as 7 inline diff-squares —
    // the array + zip_with/aggregate formulation is CodegenFallback
    // and was the measured whole cost of the gate (9.2 s → ~1 s).
    val leadCols = (0 until m).map(k =>
      lead(col("v"), k).over(wOrd).as(s"x$k"))
    val sub = days
      .select((row_number().over(wOrd).cast(LongType).as("i") +:
        leadCols): _*)
      .filter(col(s"x${m - 1}").isNotNull)
      .localCheckpoint() // both sides of the bounded all-pairs join
    val a = sub.toDF("i" +: (0 until m).map(k => s"a$k"): _*)
    val b = sub.toDF("j" +: (0 until m).map(k => s"b$k"): _*)
    val d2 = (0 until m).map(k =>
        (col(s"a$k") - col(s"b$k")) * (col(s"a$k") - col(s"b$k")))
      .reduce(_ + _)
    // bounded O(days²) nested-loop by premise — the prefCycles class
    a.join(b, abs(col("i") - col("j")) >= m / 2)
      .withColumn("d2", d2)
      .groupBy(col("i"))
      .agg(min(struct(col("d2"), col("j"))).as("mp"))
      .select(col("i"), col("mp.d2").as("mp_d2"),
        col("mp.j").as("mp_idx"))
      .orderBy(col("i"))
  }

  val tsMatrixProfileSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |      AS BIGINT) // 1000 AS v
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, v
      |  FROM days),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
      |pos AS (
      |  SELECT s.i, k.k, t.v AS x
      |  FROM idx s CROSS JOIN nn
      |  JOIN (SELECT unnest(range(0, 7)) AS k) k ON TRUE
      |  JOIN idx t ON t.i = s.i + k.k
      |  WHERE s.i + 6 <= nn.n),
      |pairs AS (
      |  SELECT a.i, b.i AS j,
      |    CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d2
      |  FROM pos a JOIN pos b ON a.k = b.k
      |  WHERE abs(a.i - b.i) >= 3
      |  GROUP BY a.i, b.i),
      |mins AS (
      |  SELECT i, CAST(MIN(d2) AS BIGINT) AS mp_d2
      |  FROM pairs GROUP BY i)
      |SELECT m.i, m.mp_d2, CAST(MIN(p.j) AS BIGINT) AS mp_idx
      |FROM mins m JOIN pairs p ON p.i = m.i AND p.d2 = m.mp_d2
      |GROUP BY m.i, m.mp_d2
      |ORDER BY m.i""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("ts_kaplan_meier"   -> (tsKaplanMeier _),
        "ts_drawdown"       -> (tsDrawdown _),
        "ts_spectrum"       -> (tsSpectrum _),
        "ts_mann_kendall"   -> (tsMannKendall _),
        "ts_ljung_box"      -> (tsLjungBox _),
        "ts_forecast_metrics" -> (tsForecastMetrics _),
        "ts_seasonal_strength" -> (tsSeasonalStrength _),
        "ts_kalman"         -> (tsKalman _),
        "ts_granger"        -> (tsGranger _),
        "ts_sax"            -> (tsSax _),
        "ts_holt"           -> (tsHolt _),
        "ts_hampel"         -> (tsHampel _),
        "ts_dtw"            -> (tsDtw _),
        "ts_matrix_profile" -> ((s: SparkSession, d: String) =>
          tsMatrixProfile(s, d)),
        "ts_acf" -> ((s: SparkSession, d: String) => tsAcf(s, d)),
        "ts_peaks"          -> (tsPeaks _),
        "ts_burstiness"     -> (tsBurstiness _),
        "ts_interpolate"    -> (tsInterpolate _),
        "ts_cross_corr"     -> ((s, d) => crossCorr(s, d)),
        "ts_rolling"        -> (rollingGate _),
        "ts_funnel_windowed" -> ((s, d) => funnelWindowed(s, d)),
        "ts_time_weighted_avg" -> (timeWeightedAvg _),
        "ts_attribution_markov" -> ((s, d) => attributionMarkov(s, d)),
        "ts_changepoint"    -> (tsChangepoint _),
        "ts_interval_union" -> (tsIntervalUnion _),
        "ts_autocorr"       -> (tsAutocorr _),
        "ts_seasonality"    -> (tsSeasonality _),
        "ts_seasonal_anomaly" -> (tsSeasonalAnomaly _),
        "ts_decompose"      -> (tsDecompose _),
        "ts_forecast_snaive" -> (tsForecastSnaive _),
        "ts_retention"      -> (tsRetention _),
        "ts_rfm"            -> (tsRfm _),
        "ts_ewma"           -> (ewma _),
        "ts_attribution"    -> (attributionLinear _),
        "ts_resample_ffill" -> (tsResample _),
        "ts_sessionize"     -> (sessionizeBatch _),
        "ts_funnel"         -> (funnel _),
        "ts_behavior_topk"  -> ((s, d) => behaviorTopK(s, d)),
        "ts_behavior_topk_lsh" -> (behaviorLshGate _),
        "ts_theil_sen"      -> (theilSen _),
        "ts_ohlc_bars"      -> (ohlcBars _),
        "ts_winsorize"      -> (tsWinsorize _),
        "ts_holt_winters"   -> (tsHoltWinters _),
        "ts_forecast_anomaly" -> (tsForecastAnomaly _),
        "ts_gaps_islands"   -> (tsGapsIslands _))
  def oracle: Map[String, String] =
    Map("ts_kaplan_meier" -> tsKaplanMeierSql,
        "ts_drawdown" -> tsDrawdownSql,
        "ts_spectrum" -> tsSpectrumSql,
        "ts_mann_kendall" -> tsMannKendallSql,
        "ts_ljung_box" -> tsLjungBoxSql,
        "ts_forecast_metrics" -> tsForecastMetricsSql,
        "ts_seasonal_strength" -> tsSeasonalStrengthSql,
        "ts_kalman" -> tsKalmanSql,
        "ts_granger" -> tsGrangerSql,
        "ts_sax" -> tsSaxSql, "ts_holt" -> tsHoltSql,
        "ts_hampel" -> tsHampelSql, "ts_dtw" -> tsDtwSql,
        "ts_matrix_profile" -> tsMatrixProfileSql,
        "ts_acf" -> tsAcfSql()) ++
    Map("ts_peaks"          -> tsPeaksSql,
        "ts_burstiness"     -> tsBurstinessSql,
        "ts_interpolate"    -> tsInterpolateSql,
        "ts_cross_corr"     -> crossCorrSql,
        "ts_rolling"        -> rollingSql,
        "ts_changepoint"    -> tsChangepointSql,
        "ts_interval_union" -> tsIntervalUnionSql,
        "ts_autocorr"       -> tsAutocorrSql,
        "ts_seasonality"    -> tsSeasonalitySql,
        "ts_seasonal_anomaly" -> tsSeasonalAnomalySql,
        "ts_decompose"      -> tsDecomposeSql,
        "ts_forecast_snaive" -> tsForecastSnaiveSql,
        "ts_retention"      -> tsRetentionSql,
        "ts_rfm"            -> tsRfmSql,
        "ts_ewma"           -> ewmaSql,
        "ts_attribution"    -> attributionLinearSql,
        "ts_attribution_markov" -> attributionMarkovSql(),
        "ts_time_weighted_avg" -> timeWeightedAvgSql,
        "ts_funnel_windowed" -> funnelWindowedSql,
        "ts_resample_ffill" -> tsResampleSql,
        "ts_sessionize"     -> sessionizeBatchSql,
        "ts_funnel"         -> funnelSql,
        "ts_behavior_topk"  -> behaviorTopKSql,
        "ts_behavior_topk_lsh" -> behaviorLshSql,
        "ts_theil_sen"      -> theilSenSql,
        "ts_ohlc_bars"      -> ohlcBarsSql,
        "ts_winsorize"      -> tsWinsorizeSql,
        "ts_holt_winters"   -> tsHoltWintersSql,
        "ts_forecast_anomaly" -> tsForecastAnomalySql,
        "ts_gaps_islands"   -> tsGapsIslandsSql)
}
