package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Round-11 plan contracts: the whole-surface interpreted-expression
  * inventory is now a CHECKED-IN snapshot (`tools/fallback_inventory
  * .tsv`, written and strictly diffed by `PlanAudit --write/--strict`
  * in the close protocol — round-10 verdict task 2). This spec makes
  * the snapshot load-bearing inside `sbt test` as well: structural
  * hygiene over the whole file, plus exact recomputation for a cheap
  * representative of each tolerated class and for the round-11 gates
  * (a new CodegenFallback in one of these fails HERE, not in a bench
  * diff rounds later; the full 500-gate recomputation stays in the
  * close protocol where its runtime belongs). */
class RoundElevenPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fallbacksOf(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => fallbacksOf(a.executedPlan)
      case n => n.expressions.flatMap(_.collect {
        case e: CodegenFallback => e.prettyName
      }).toSeq ++ n.subqueries.flatMap(fallbacksOf)
    }.flatten.distinct

  private def fallbackExprs(df: DataFrame): Set[String] =
    fallbacksOf(df.queryExecution.executedPlan).toSet

  private lazy val snapshot: Map[String, Set[String]] =
    scala.io.Source.fromFile(PlanAudit.InventoryPath, "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty)
      .map { l =>
        val Array(g, es) = l.split("\t", 2)
        g -> es.split(",").toSet
      }.toMap

  test("fallback inventory snapshot: parses, names only registered " +
      "gates, stays in the tolerated once-per-row expression classes, " +
      "and no entry is empty") {
    assert(snapshot.nonEmpty)
    val registered = SparkEntry.queries.keySet
    val ghosts = snapshot.keySet -- registered
    assert(ghosts.isEmpty, s"snapshot names unregistered gates: $ghosts")
    snapshot.foreach { case (g, es) =>
      assert(es.nonEmpty && es.forall(_.nonEmpty), s"empty entry for $g")
    }
    // the tolerated universe: HOF machinery, object-based aggregates,
    // and their plumbing — a NEW class (e.g. a whole new interpreted
    // surface) must be admitted here deliberately, with rationale
    val tolerated = Set(
      // higher-order functions: interpreted lambda per ROW over a
      // small array (never per element of a hot inner loop — that
      // class gets kernel-ized, see plans/TextExpressions.scala)
      "transform", "filter", "aggregate", "zip_with", "exists",
      "forall", "map_filter", "transform_values", "lambdafunction",
      "namedlambdavariable",
      // object-based (non-codegen by design in Spark) aggregates
      "collect_list", "collect_set", "percentile", "mode",
      "histogram_numeric", "approx_count_distinct", "hll_sketch_agg",
      "hll_sketch_estimate", "hll_union_agg", "pivotfirst", "topk",
      "percentile_approx",
      // JSON parse is inherently interpreted (Jackson on the row)
      "from_json",
      // generator/array plumbing that rides along with the above
      "array_sort", "sequence", "array_distinct", "replicaterows",
      // graft's own deliberate CodegenFallback (documented at its
      // definition: per-row, bounded gram width)
      "gramupper")
    val alien = snapshot.values.flatten.toSet -- tolerated
    assert(alien.isEmpty,
      s"expression classes outside the tolerated set: $alien — " +
        "either kernel-ize or extend the tolerated universe with a " +
        "rationale here")
  }

  test("representative recomputation: one gate per tolerated class " +
      "plus the round-11 gates match the snapshot EXACTLY (new " +
      "interpreted expressions fail sbt test, not a later bench)") {
    // cheap builders only — the full-surface diff runs in the close
    // protocol via PlanAudit --strict
    val reps = Map[String, (org.apache.spark.sql.SparkSession, String)
        => DataFrame](
      // zip_with class (the priciest tolerated class, 6 gates)
      "q42_array_hof" -> SparkEntry.queries("q42_array_hof"),
      // transform class (largest class)
      "dedup_span_union" -> SparkEntry.queries("dedup_span_union"),
      // round-11 additions — compiled kernels, must stay clean
      "dedup_exact_substring" -> SparkEntry.queries("dedup_exact_substring"),
      "dedup_memorization_risk" -> SparkEntry.queries("dedup_memorization_risk"))
    reps.foreach { case (name, fn) =>
      val got = fallbackExprs(fn(spark, sf))
      val want = snapshot.getOrElse(name, Set.empty)
      assert(got == want,
        s"$name fallback drift: got $got, snapshot has $want — " +
          "kernel-ize the regression or refresh tools/fallback_" +
          "inventory.tsv via PlanAudit --write WITH justification")
    }
  }

  test("exact-substring dedup plan: fully codegen'd (no interpreted " +
      "expression anywhere incl. subqueries), no cartesian product") {
    val df = graft.ops.Dedup.exactSubstring(spark, sf)
    val fb = fallbackExprs(df)
    assert(fb.isEmpty, s"CodegenFallback in exact-substring: $fb")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
