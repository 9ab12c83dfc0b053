package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Pattern mining: frequent co-occurrence pairs (market-basket
  * association analysis) over the order → part bipartite relation.
  *
  * Scale shape: the pair generator is an equi self-join on the basket
  * key (l_orderkey) — NOT a cross join — so its output is Σ k² over
  * per-basket item counts k, which retail-shaped data bounds by a
  * small constant; at 100 TB the one guard a pipeline adds is a cap
  * on pathological basket sizes (a `count ≤ K` filter per basket)
  * before the join. Support counting is a map-side-combined groupBy
  * on the pair; the per-item and total-order counts it joins for the
  * lift metric are metadata-sized (|parts| rows, 1 row).
  *
  * Determinism: support counts are integers; lift is computed as ONE
  * fixed-shape double expression over those integers
  * ((n_pair·n_orders)/(n_a·n_b)) — identical operand order in the
  * oracle, so the doubles are bit-identical cross-engine.
  */
object Mining {

  /** Shared basket frame + the metadata-sized count frames both the
    * pair miner and the rule generator derive from — built ONCE
    * (`persist`) so the corpus is basketized a single time per
    * query. */
  private case class Baskets(baskets: DataFrame, totals: DataFrame,
      cnt: DataFrame)

  private def basketize(lineitem: DataFrame): Baskets = {
    // ONE shuffle builds the baskets (map-side partial collect_set —
    // the old distinct + self-join re-shuffled the item table three
    // times and materialized the join's row explosion through an
    // exchange; here pair expansion happens scan-side from the sorted
    // basket array, bounded by basket size, and never crosses a wire).
    val baskets = lineitem
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .persist()
    val totals = baskets.agg(count(lit(1)).as("n_orders"))
    val cnt = baskets.select(explode(col("ps")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_pk"))
    Baskets(baskets, totals, cnt)
  }

  private def pairCounts(baskets: DataFrame, minSup: Long): DataFrame =
    baskets
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
        "slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"))
        .as("p"))
      .select(col("p.pa"), col("p.pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSup)

  def copurchasePairs(lineitem: DataFrame, minSup: Long): DataFrame = {
    val b = basketize(lineitem)
    pairCounts(b.baskets, minSup)
      .crossJoin(broadcast(b.totals))
      .join(b.cnt.toDF("pa", "n_a"), "pa")
      .join(b.cnt.toDF("pb", "n_b"), "pb")
      .select(col("pa"), col("pb"), col("n_pair"),
        ((col("n_pair").cast(DoubleType) * col("n_orders").cast(DoubleType))
          / (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
          .as("lift"))
      .orderBy(col("pa"), col("pb"))
  }

  def copurchaseGate(s: SparkSession, dir: String): DataFrame =
    copurchasePairs(Tables.lineitem(s, dir), minSup = 2L)

  val copurchaseSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |tot AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
      |cnt AS (SELECT pk, count(*) AS n_pk FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_pair
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p.pa, p.pb, p.n_pair,
      |  (CAST(p.n_pair AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
      |    / (CAST(ca.n_pk AS DOUBLE) * CAST(cb.n_pk AS DOUBLE)) AS lift
      |FROM pairs p
      |CROSS JOIN tot t
      |JOIN cnt ca ON ca.pk = p.pa
      |JOIN cnt cb ON cb.pk = p.pb
      |ORDER BY pa, pb""".stripMargin

  /** Sequential-pattern support (the length-2 PrefixSpan/SPADE core):
    * for every ordered type pair (a → b), how many users exhibit an
    * `a` event strictly BEFORE some `b` event — order-sensitive and
    * gap-tolerant, which is exactly what neither the unordered
    * co-purchase baskets nor the adjacent-only [[Graph.transitions]]
    * capture. `∃ t_a < t_b  ⇔  min_ts(a) < max_ts(b)` turns the
    * per-user existence test into pure min/max algebra: one
    * (user, type) aggregate (map-combinable, events never pair-wise
    * joined), a per-user type×type join bounded by |types|² ≈ 25
    * combos per user, and a final support count. Timestamps compare
    * as integer micros; support excludes a = b (self-sequences are
    * trivially monotone).
    *
    * At 100 TB the (user, type) reduce is the only corpus-wide
    * shuffle, and everything after runs on a frame |users|·|types|
    * wide — the PrefixSpan projection-database blowup never
    * happens. */
  def seqPatterns(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .localCheckpoint()
    val a = spans.select(col("user_id"), col("event_type").as("a"),
      col("mn").as("a_mn"))
    val b = spans.select(col("user_id"), col("event_type").as("b"),
      col("mx").as("b_mx"))
    a.join(b, Seq("user_id"))
      .filter(col("a") =!= col("b") && col("a_mn") < col("b_mx"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("a"), col("b"))
  }

  val seqPatternsSql: String =
    """WITH spans AS (
      |  SELECT user_id, event_type,
      |    MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      |  FROM events GROUP BY user_id, event_type)
      |SELECT a.event_type AS a, b.event_type AS b,
      |  COUNT(*) AS support
      |FROM spans a JOIN spans b ON a.user_id = b.user_id
      |WHERE a.event_type <> b.event_type AND a.mn < b.mx
      |GROUP BY a.event_type, b.event_type
      |ORDER BY support DESC, a, b""".stripMargin

  /** Association rules (the directed completion of
    * [[copurchasePairs]]): every frequent unordered pair {a, b} emits
    * BOTH rules a→b and b→a with support, confidence and lift — the
    * Agrawal–Srikant second phase, which needs no further corpus
    * scan: rules derive purely from the pair/item/total support
    * counts the pair miner already aggregated.
    *
    * Determinism: confidence and lift are emitted as ppm BIGINTs via
    * integer floor-division over exact support counts
    * (`n_pair·10⁶ div n_antecedent`), so no float ever forms —
    * sturdier than the copurchase gate's fixed-shape double, and the
    * natural form for a rule-threshold filter downstream.
    *
    * Scale: identical to [[copurchasePairs]] — basket-bounded pair
    * expansion, metadata-sized count joins; the rule fan-out is a
    * 2× projection of the pair frame, shuffle-free. */
  def assocRules(s: SparkSession, dir: String, minSup: Long = 2L,
      minConfPpm: Long = 100000L): DataFrame = {
    val b = basketize(Tables.lineitem(s, dir))
    // Both rule directions from ONE evaluation of the pair frame: a
    // unionAll of two selects re-runs the basket explosion + pair
    // groupBy per branch; exploding a 2-element direction array keeps
    // the mirror fan-out inside the same (codegen'd) projection.
    val rules = pairCounts(b.baskets, minSup)
      .select(explode(array(
        struct(col("pa").as("ante"), col("pb").as("cons")),
        struct(col("pb").as("ante"), col("pa").as("cons")))).as("r"),
        col("n_pair"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("n_pair"))
    rules
      .join(b.cnt.toDF("ante", "n_ante"), "ante")
      .join(b.cnt.toDF("cons", "n_cons"), "cons")
      .crossJoin(broadcast(b.totals))
      .select(col("ante"), col("cons"), col("n_pair"),
        expr("(n_pair * 1000000L) div n_ante").as("conf_ppm"),
        expr("(n_pair * n_orders * 1000000L) div (n_ante * n_cons)")
          .as("lift_ppm"))
      .filter(col("conf_ppm") >= minConfPpm)
      .orderBy(col("ante"), col("cons"))
  }

  val assocRulesSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |tot AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
      |cnt AS (SELECT pk, count(*) AS n_item FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_pair
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |rules AS (
      |  SELECT pa AS ante, pb AS cons, n_pair FROM pairs
      |  UNION ALL
      |  SELECT pb AS ante, pa AS cons, n_pair FROM pairs)
      |SELECT r.ante, r.cons, r.n_pair,
      |  (r.n_pair * 1000000) // ca.n_item AS conf_ppm,
      |  (r.n_pair * t.n_orders * 1000000) // (ca.n_item * cb.n_item)
      |    AS lift_ppm
      |FROM rules r
      |JOIN cnt ca ON ca.pk = r.ante
      |JOIN cnt cb ON cb.pk = r.cons
      |CROSS JOIN tot t
      |WHERE (r.n_pair * 1000000) // ca.n_item >= 100000
      |ORDER BY ante, cons""".stripMargin

  /** Frequent 3-itemsets — one Apriori level above
    * [[copurchasePairs]]: triples of parts co-present in ≥ `minSup`
    * order baskets. The Apriori downward-closure prune is applied
    * structurally: every item of a frequent triple is itself
    * frequent, so baskets are RE-BUILT from support-filtered items
    * before any combination enumerates — the cubic in-array expansion
    * (the pair miner's scan-side HOF, one level deeper) only ever
    * sees items that can participate. Combinations come from sorted
    * basket arrays, so pa < pb < pc by construction and no distinct
    * is needed; support counts are exact BIGINTs.
    *
    * Scale: the prune is a broadcast semi-join on the metadata-sized
    * frequent-item frame; expansion cost is Σ k³/6 over PRUNED
    * basket sizes k (plus the basket-size cap noted on the object
    * doc); support counting is one map-combined groupBy on the
    * triple. The oracle brute-forces the same triples through a
    * three-way self-join — the pruned path must reproduce it
    * exactly. */
  def tripleCounts(lineitem: DataFrame, minSup: Long): DataFrame = {
    val b = basketize(lineitem)
    val freq = b.cnt.filter(col("n_pk") >= minSup).select(col("pk"))
    val pruned = b.baskets
      .select(col("ok"), explode(col("ps")).as("pk"))
      .join(broadcast(freq), "pk")
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
    pruned.filter(size(col("ps")) >= 3)
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> flatten(transform(" +
        "slice(ps, i + 2, size(ps)), (y, j) -> transform(" +
        "slice(ps, i + j + 3, size(ps)), " +
        "z -> struct(x AS pa, y AS pb, z AS pc))))))")).as("t"))
      .select(col("t.pa"), col("t.pb"), col("t.pc"))
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("n_triple"))
      .filter(col("n_triple") >= minSup)
      .orderBy(col("pa"), col("pb"), col("pc"))
  }

  def tripleGate(s: SparkSession, dir: String): DataFrame =
    tripleCounts(Tables.lineitem(s, dir), minSup = 2L)

  val tripleSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem)
      |SELECT a.pk AS pa, b.pk AS pb, c.pk AS pc,
      |  CAST(COUNT(*) AS BIGINT) AS n_triple
      |FROM items a
      |JOIN items b ON b.ok = a.ok AND a.pk < b.pk
      |JOIN items c ON c.ok = a.ok AND b.pk < c.pk
      |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
      |ORDER BY pa, pb, pc""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mine_triples" -> (tripleGate _),
    "mine_copurchase" -> (copurchaseGate _),
    "mine_assoc_rules" -> ((s: SparkSession, d: String) =>
      assocRules(s, d)),
    "mine_seq_patterns" -> (seqPatterns _))

  def oracle: Map[String, String] = Map(
    "mine_triples" -> tripleSql,
    "mine_copurchase" -> copurchaseSql,
    "mine_assoc_rules" -> assocRulesSql,
    "mine_seq_patterns" -> seqPatternsSql)
}
