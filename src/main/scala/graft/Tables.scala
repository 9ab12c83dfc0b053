package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads go through
  * `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown and column pruning apply; at cluster scale the same call
  * works on a partitioned directory or an s3a:// URI unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** `events.ts` has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]) unless read as raw nanos via
    * legacy.parquet.nanosAsLong — and plain TIMESTAMP(MICROS). Handle
    * both by dispatching on the type the reader actually produced:
    * a long is nanos → truncate to micros (the same truncation DuckDB
    * applies reading ns into its µs TIMESTAMP); a native timestamp
    * (incl. NTZ) is canonicalized to session-TZ TimestampType so every
    * downstream operator sees one type regardless of the file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: long/long in Spark is double
        // division, which loses sub-microsecond bits past 2^53 ns.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Session TZ is pinned to UTC everywhere (builder config), so
        // this cast is wall-clock-preserving and keeps one ts type.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
