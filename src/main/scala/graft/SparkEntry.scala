package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.ParityQueries.queries ++
    ops.TextAnalysis.queries ++ ops.Dedup.queries ++
    ops.Similarity.queries ++ ops.StreamingQueries.queries ++
    ops.Multimodal.queries ++ ops.Skew.queries ++ ops.Bucketing.queries ++
    ops.AsofJoin.queries ++ ops.CurationPipeline.queries ++
    ops.ZOrder.queries ++ ops.Maintenance.queries ++
    ops.DataQuality.queries ++ ops.TimeSeries.queries ++
    ops.TrainingData.queries ++ ops.Graph.queries ++ ops.Linkage.queries ++
    ops.Mining.queries ++ ops.LanguageModel.queries ++
    ops.Spectral.queries ++
    ops.Evaluation.queries ++ ops.Learn.queries ++
    ops.RuntimeFilters.queries ++ ops.Sketches.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.ParityQueries.oracle ++
    ops.TextAnalysis.oracle ++ ops.Dedup.oracle ++
    ops.Similarity.oracle ++ ops.StreamingQueries.oracle ++
    ops.Multimodal.oracle ++ ops.Skew.oracle ++ ops.Bucketing.oracle ++
    ops.AsofJoin.oracle ++ ops.CurationPipeline.oracle ++
    ops.ZOrder.oracle ++ ops.Maintenance.oracle ++
    ops.DataQuality.oracle ++ ops.TimeSeries.oracle ++
    ops.TrainingData.oracle ++ ops.Graph.oracle ++ ops.Linkage.oracle ++
    ops.Mining.oracle ++ ops.LanguageModel.oracle ++
    ops.Spectral.oracle ++
    ops.Evaluation.oracle ++ ops.Learn.oracle ++
    ops.RuntimeFilters.oracle ++ ops.Sketches.oracle
}
