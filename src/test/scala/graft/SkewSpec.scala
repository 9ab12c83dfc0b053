package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.Tables

class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join equals the plain join exactly") {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(events, cust, "user_id", "event_id")
      .select("event_id", "user_id", "c_mktsegment")
    val plain = events.join(cust, "user_id")
      .select("event_id", "user_id", "c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads a hot key over multiple salts") {
    import spark.implicits._
    // one hot key: 1000 rows of key 7, dim of 3 keys
    val fact = (1 to 1000).map(i => (i.toLong, 7L)) ++
      Seq((2000L, 1L), (2001L, 2L))
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"))
    val out = Skew.saltedJoin(fact.toDF("id", "k"), dim.toDF("k", "name"),
      "k", "id", nSalts = 8)
    assert(out.count() == 1002)
    // the hot key's rows really carry > 1 distinct salt pre-drop
    val salts = fact.toDF("id", "k").filter($"k" === 7)
      .withColumn("_salt", pmod(xxhash64($"id"), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }

  test("two-phase salted aggregation equals direct groupBy") {
    // decimal value → addition is associative, equality is exact
    val events = Tables.events(spark, dir).withColumn("value",
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
    val salted = Skew.saltedSum(events, "user_id", "value", "event_id")
      .select(col("user_id"), col("total").cast("decimal(38,4)"), col("n"))
    val direct = events.groupBy(col("user_id"))
      .agg(sum(col("value")).cast("decimal(38,4)").as("total"),
        count(lit(1)).as("n"))
    assert(salted.exceptAll(direct).isEmpty &&
      direct.exceptAll(salted).isEmpty)
  }
}
