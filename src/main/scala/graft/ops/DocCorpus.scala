package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic near-duplicate corpus for the dedup operators.
  *
  * The driver's `documents` table has all-distinct texts, so dedup on
  * it is vacuous. This builder unions it with two mutated copies —
  * built from the same arithmetic in Spark and in the oracle SQL, so
  * DuckDB reconstructs the identical corpus:
  *
  *   - `doc_id + 10000`: whitespace/case mutation (double spaces,
  *     uppercased) — an *exact* duplicate under normalization;
  *   - `doc_id + 20000`: last token dropped — a *near* duplicate
  *     (high Jaccard, not exact).
  *
  * Only `doc_id < 100` gets mutated copies, keeping the pair count
  * proportional to corpus size (and the quadratic verify step tiny).
  */
object DocCorpus {

  def withDuplicates(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val wsCase = docs.filter(col("doc_id") < 100).select(
      (col("doc_id") + 10000).as("doc_id"),
      upper(expr("replace(text, ' ', '  ')")).as("text"))
    val dropLast = docs.filter(col("doc_id") < 100).select(
      (col("doc_id") + 20000).as("doc_id"),
      expr("""concat_ws(' ',
        slice(filter(split(trim(text), '\\s+'), t -> length(t) > 0), 1,
          size(filter(split(trim(text), '\\s+'), t -> length(t) > 0)) - 1))""")
        .as("text"))
    docs.union(wsCase).union(dropLast)
  }

  /** DuckDB CTE reconstructing [[withDuplicates]] — prefix dedup
    * oracles with `WITH corpus AS (...)`. */
  val CorpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id,
      |         upper(replace(text, ' ', '  ')) AS text
      |  FROM documents WHERE doc_id < 100
      |  UNION ALL
      |  SELECT doc_id + 20000 AS doc_id,
      |         array_to_string(
      |           list_slice(toks, 1, len(toks) - 1), ' ') AS text
      |  FROM (SELECT doc_id,
      |          list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                      t -> len(t) > 0) AS toks
      |        FROM documents WHERE doc_id < 100)
      |)""".stripMargin

  /** Normalized text (the exact-dedup grouping key): lowercase,
    * whitespace runs collapsed. Same in [[graft.functions.TextFunctions
    * .fingerprint]] and the SQL below. */
  val NormalizeSql: String =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
}
