package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted physical plans for selected queries and
  * flag scale smells — missing filter pushdown, unexpected full-column
  * scans, non-broadcast joins of tiny dimensions, missing whole-stage
  * codegen. Usage: runMain graft.PlanAudit <sfDir> [q1,q2,...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // A hash(k1) exchange may serve a (k1, k2) join (subset-key
      // co-partitioning — Spark made the conservative choice the
      // default in 3.4); the engine's shared-exchange plans rely on it.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          println(s"\n===== $name =====")
          println(plan)
          val smells = Seq(
            "PushedFilters: []" -> "no pushed filters on a scan",
            "SortMergeJoin" -> "sort-merge join (check if broadcast fits)",
            "CartesianProduct" -> "cartesian product",
            "BatchEvalPython" -> "python UDF in plan")
            .collect { case (pat, msg) if plan.contains(pat) => msg }
          if (smells.nonEmpty) println(s"[smells] $name: ${smells.mkString("; ")}")
          // Informational (NOT part of the pinned [smells] contract):
          // interpreted expressions in the plan. Benign when the HOF
          // runs once per row over a small array (the tokenizer-filter
          // class); a per-element/per-char fallback in a hot loop is
          // the matrix-profile/cdc-chunks 5-10x cost class.
          def fbOf(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[String] = p.collect {
            // AQE wrapper hides its plan from TreeNode.collect —
            // recurse explicitly or the scan is vacuously empty;
            // subquery plans hang off expressions, not the operator
            // tree, so scan node.subqueries recursively too
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => fbOf(a.executedPlan)
            case n => n.expressions.flatMap(_.collect {
              case e: org.apache.spark.sql.catalyst.expressions
                  .codegen.CodegenFallback => e.prettyName
            }).toSeq ++ n.subqueries.flatMap(fbOf)
          }.flatten
          val fallbacks =
            fbOf(df.queryExecution.executedPlan).distinct.sorted
          if (fallbacks.nonEmpty)
            println(s"[fallback] $name: ${fallbacks.mkString(", ")}")
        } catch { case e: Throwable =>
          println(s"===== $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
