package graft

import org.apache.spark.sql.functions._

/** Schema evolution on the parquet lake: a later write adds a column;
  * mergeSchema reconciles the footers and back-fills nulls — the
  * standard additive-evolution contract a long-lived 100 TB dataset
  * relies on (and the reason the engine's readers never hard-code a
  * footer: the declared/merged schema drives the scan). */
class SchemaEvolutionSpec extends SparkSpec {

  test("added column merges across file generations, old rows null") {
    import spark.implicits._
    val out = tmpDir("evolving")
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .write.mode("overwrite").parquet(out)
    Seq((3L, "gamma", 0.9)).toDF("id", "name", "quality")
      .write.mode("append").parquet(out)

    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "quality"))
    assert(merged.count() == 3)
    val byId = merged.collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(byId(1L) && byId(2L) && !byId(3L))

    // a declared schema also reads BOTH generations (missing column
    // null-filled) without mergeSchema's footer scan — the cheap path
    val declared = spark.read
      .schema("id BIGINT, name STRING, quality DOUBLE").parquet(out)
    assert(declared.count() == 3 &&
      declared.filter(col("quality").isNull).count() == 2)
  }
}
