package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-declared fixed-width text ingestion — the mainframe/legacy
  * feed format, completing the text-source family (CSV positional,
  * JSONL name-bound, fixed-width OFFSET-bound) on the SAME cast
  * contract:
  *
  *   - each field is a `substring` slice at its declared offset —
  *     binding is by byte position, no delimiter parsing at all
  *     (embedded delimiters/quotes simply don't exist here);
  *   - slices are space-padded on export and trimmed on read, so the
  *     empty→NULL normalization, multi-format timestamp chain, and
  *     lenient HALF_UP decimals of [[CsvIngest.castSql]] apply
  *     verbatim;
  *   - a short line yields NULL fields past its end (substring past
  *     the end is '' → NULL), the row-level analogue of the CSV
  *     short-row demotion.
  *
  * One `spark.read.text` scan + one codegen'd projection of
  * substrings and casts — no UDFs, no per-row splitting; at 100 TB
  * fixed-width is the CHEAPEST format to cut: every task slices by
  * arithmetic, and unreferenced fields are never materialized when
  * Catalyst prunes the projection.
  */
object FixedWidthIngest {

  /** Write `df` as fixed-width lines: every column stringified with
    * the caller's formats (caller casts beforehand) and right-padded
    * to its width. Inherent to the format: a value LONGER than its
    * declared width is truncated by `rpad` — size widths from the
    * domain's maximum (as any fixed-width feed spec does); there is
    * no escape mechanism by definition. */
  def write(df: DataFrame, widths: Seq[Int], outDir: String): Unit = {
    val line = concat(df.columns.toSeq.zip(widths).map {
      case (c, w) => rpad(coalesce(col(c).cast(StringType), lit("")), w, " ")
    }: _*)
    df.select(line.as("value")).write.mode("overwrite").text(outDir)
  }

  /** Read fixed-width lines under the declared schema and widths —
    * field i occupies [offset_i, offset_i + width_i). */
  def read(spark: SparkSession, path: String, schema: StructType,
      widths: Seq[Int], strict: Boolean = false): DataFrame = {
    require(widths.length == schema.fields.length,
      s"${widths.length} widths for ${schema.fields.length} fields")
    val offsets = widths.scanLeft(1)(_ + _)
    val raw = spark.read.text(path)
    val cols: Seq[Column] = schema.fields.toSeq.zipWithIndex.map {
      case (f, i) =>
        val slice = s"trim(substring(value, ${offsets(i)}, ${widths(i)}))"
        expr(CsvIngest.castSql(slice, f.dataType, strict)).as(f.name)
    }
    raw.select(cols: _*)
  }
}
