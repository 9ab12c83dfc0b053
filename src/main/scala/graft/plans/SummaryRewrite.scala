package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.types.DataType

/** Transparent materialized-view rewrite — the OLAP-engine summary
  * table, done the Catalyst way: a `Rule[LogicalPlan]` that matches an
  * aggregate over a registered source table whose grouping keys are a
  * subset of the view's dimensions (and whose filters touch only
  * dimensions) and swaps the scan for the pre-aggregated summary,
  * re-aggregating the stored partials. The caller's DataFrame code
  * does not change — `groupBy(...).agg(...)` over the raw table is
  * silently answered from the summary.
  *
  * Why this shape scales: SUM/MIN/MAX/COUNT are self-decomposable —
  * `sum = sum of partial sums`, `min = min of partial mins`, `count =
  * sum of partial counts` — so a summary at the finest dimension
  * grain answers EVERY coarser rollup without touching the fact
  * table. At 100 TB that is the difference between a full scan and a
  * dimension-sized read; the summary is built ONCE (one shuffle) and
  * amortized over every subsequent query.
  *
  * Correctness guards: the rewrite fires only when every result
  * expression is derivable from the registered partials — grouping
  * attrs, `SUM(x)` / `MIN(x)` / `MAX(x)` over a registered measure
  * (including a `CAST` the view applied identically at build time,
  * matched by type), and `COUNT(*)`/`COUNT(1)` (merged as
  * `COALESCE(SUM(cnt), 0)` to preserve COUNT's empty-input zero).
  * Anything else — a non-dimension filter, an AVG, a DISTINCT —
  * leaves the plan untouched. Output aliases reuse the original
  * exprIds, so parent operators never see the substitution.
  */
object SummaryRewrite {

  /** A registered summary table.
    *
    * @param sourcePath path fragment identifying the fact table scan
    * @param mvPath     parquet directory of the summary
    * @param dims       dimension column names (the view's grain)
    * @param measures   (aggFn, srcCol, castType) → summary column
    *                   holding that partial, castType "" = no cast
    * @param countCol   summary column holding COUNT(*) partials
    */
  final case class MvDef(sourcePath: String, mvPath: String,
      dims: Set[String], measures: Map[(String, String, String), String],
      countCol: String)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def register(mv: MvDef): Unit = registry.put(mv.sourcePath, mv)
  def clear(): Unit = registry.clear()

  /** Build + write the summary at the given grain: COUNT(*) plus
    * sum/min/max partials for each (fn, col, cast) measure key. */
  def buildMv(df: DataFrame, dims: Seq[String],
      measures: Seq[(String, String, String)], mvPath: String)
      : Map[(String, String, String), String] = {
    val cols = measures.map { case (fn, c, castT) =>
      val base = if (castT.isEmpty) col(c) else col(c).cast(castT)
      val name = s"${fn}_$c"
      (fn match {
        case "sum" => fsum(base)
        case "min" => fmin(base)
        case "max" => fmax(base)
      }).as(name)
    }
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), cols: _*)
      .write.mode("overwrite").parquet(mvPath)
    measures.map(k => k -> s"${k._1}_${k._2}").toMap
  }

  /** Install the rewrite rule once per session (idempotent). */
  def install(s: SparkSession): Unit = {
    val already = s.experimental.extraOptimizations
      .exists(_.isInstanceOf[SummaryRewriteRule])
    if (!already)
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new SummaryRewriteRule(s)
  }

  private[plans] def lookup(path: String): Option[MvDef] = {
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (path.contains(e.getKey)) return Some(e.getValue)
    }
    None
  }
}

final class SummaryRewriteRule(session: SparkSession)
    extends Rule[LogicalPlan] {
  import SummaryRewrite._

  /** Unwrap Project/Filter above a file-source relation; collect the
    * filter conditions. Returns None for any other operator. */
  private def unwrap(plan: LogicalPlan,
      conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case r: LogicalRelation => Some((r, conds))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, conds)
      case Filter(cond, child) => unwrap(child, conds :+ cond)
      case _ => None
    }

  private def relationPath(r: LogicalRelation): String = r.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.map(_.toString).mkString(",")
    case _ => ""
  }

  private def castKey(e: Expression): Option[(String, String)] = e match {
    case a: AttributeReference => Some((a.name, ""))
    case Cast(a: AttributeReference, dt, _, _) =>
      Some((a.name, dt.catalogString))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, _, child, _) =>
      val rewritten = for {
        (rel, conds) <- unwrap(child, Nil)
        mv <- lookup(relationPath(rel))
        groupAttrs <- Some(groups).filter(_.forall {
          case a: AttributeReference => mv.dims.contains(a.name)
          case _ => false
        })
        _ <- Some(conds).filter(_.forall(
          _.references.forall(a => mv.dims.contains(a.name))))
        newPlan <- rewrite(agg, mv,
          groupAttrs.map(_.asInstanceOf[AttributeReference]), conds)
      } yield newPlan
      rewritten.getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, mv: MvDef,
      groups: Seq[AttributeReference], conds: Seq[Expression])
      : Option[LogicalPlan] = {
    // Fresh-exprId copy of the summary relation for this use site.
    val mvPlan = session.read.parquet(mv.mvPath)
      .queryExecution.analyzed match {
      case r: LogicalRelation => r.newInstance()
      case other => other
    }
    val byName = mvPlan.output.map(a => a.name -> a).toMap
    if (!byName.contains(mv.countCol)) return None

    def partial(fn: String, e: Expression): Option[Attribute] =
      castKey(e).flatMap { case (c, t) =>
        mv.measures.get((fn, c, t)).flatMap(byName.get)
      }

    def mergeAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(e, _) => partial("sum", e).map(a =>
        AggregateExpression(Sum(a), Complete, isDistinct = false))
      case Min(e) => partial("min", e).map(a =>
        AggregateExpression(Min(a), Complete, isDistinct = false))
      case Max(e) => partial("max", e).map(a =>
        AggregateExpression(Max(a), Complete, isDistinct = false))
      case Count(Seq(Literal(_, _))) | Count(Nil) =>
        Some(Coalesce(Seq(
          AggregateExpression(Sum(byName(mv.countCol)), Complete,
            isDistinct = false),
          Literal(0L))))
      case _ => None
    }

    // Recursive translation: aggregate calls merge the stored
    // partials, bare attributes must be dimensions, and any scalar
    // expression AROUND them (casts the optimizer collapsed into the
    // aggregate list, arithmetic, literals) is carried over verbatim.
    def translate(e: Expression): Option[Expression] = e match {
      case AggregateExpression(fn, _, false, None, _) => mergeAgg(fn)
      case _: AggregateExpression => None // DISTINCT / FILTER: bail
      case a: AttributeReference =>
        if (mv.dims.contains(a.name)) byName.get(a.name) else None
      case _ if e.children.nonEmpty =>
        val kids = e.children.map(translate)
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
      case leaf => Some(leaf)
    }
    val newResults: Seq[Option[NamedExpression]] = agg.aggregateExpressions
      .map {
        case a: AttributeReference =>
          translate(a).map(t => Alias(t, a.name)(exprId = a.exprId))
        case al @ Alias(child, nm) =>
          translate(child).map(t => Alias(t, nm)(exprId = al.exprId))
        case _ => None
      }
    if (newResults.exists(_.isEmpty)) return None

    val mapped: LogicalPlan =
      if (conds.isEmpty) mvPlan
      else Filter(conds.map(_.transform {
        case a: AttributeReference if byName.contains(a.name) =>
          byName(a.name)
      }).reduce(And), mvPlan)
    Some(Aggregate(groups.map(g => byName(g.name)),
      newResults.map(_.get), mapped))
  }
}
