package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Entity resolution / record linkage: match a "dirty" registry
  * against a clean one WITHOUT the quadratic all-pairs comparison,
  * via multi-pass key-omission blocking (the classic record-linkage
  * blocking discipline; the omission construction is the same idea as
  * spelling-correction deletion neighborhoods): each pass's blocking
  * key is the record with one character segment cut out, the passes'
  * omitted segments cover every position an edit may touch, so two
  * records within the edit budget MUST collide in at least one pass —
  * blocking is exact (zero false negatives), not heuristic.
  * Expensive edit-distance scoring then runs only inside blocks.
  *
  * Scale shape: each record emits one (pass, key) row per pass — a
  * linear projection; candidates come from equi hash joins on the
  * key, so the shuffle carries (id, name, key) and the quadratic term
  * is bounded by Σ block² over keys that retain most of the record's
  * entropy. The dirty side never cross-joins the clean side.
  */
object Linkage {

  /** Candidate pairs from key-omission blocking, scored with
    * Levenshtein, kept when distance ≤ `maxDist`. `omit` lists the
    * 1-based (start, length) segments — one blocking pass per entry,
    * each pass keying on the name with that segment removed. Exact
    * for any pair of equal-length records whose differing positions
    * all fall inside a single omitted segment. */
  def blockedLink(dirty: DataFrame, clean: DataFrame,
      omit: Seq[(Int, Int)], maxDist: Int): DataFrame = {
    def passKeys(df: DataFrame): DataFrame = {
      val ks: Seq[Column] = omit.zipWithIndex.map { case ((start, len), i) =>
        struct(lit(i).as("pass"),
          concat(expr(s"substring(name, 1, ${start - 1})"),
                 expr(s"substring(name, ${start + len}, 1000000)")).as("bk"))
      }
      df.select(col("id"), col("name"), explode(array(ks: _*)).as("b"))
        .select(col("id"), col("name"),
          col("b.pass").as("pass"), col("b.bk").as("bk"))
    }
    val cand = passKeys(dirty).toDF("did", "dname", "pass", "bk")
      .join(passKeys(clean).toDF("cid", "cname", "pass", "bk"),
        Seq("pass", "bk"))
      .select(col("did"), col("dname"), col("cid"), col("cname"))
      .distinct()
    cand
      .withColumn("lev",
        levenshtein(col("dname"), col("cname")).cast(LongType))
      .filter(col("lev") <= maxDist)
      .select(col("did").as("dirty_id"), col("cid").as("clean_id"),
        col("lev"))
      .orderBy(col("dirty_id"), col("clean_id"))
  }

  /** Bounded clean registry: customers 0..399 (18-char names —
    * `Customer#` + 9 digits — constant through position 14 at this
    * key range, so every ≤1-edit pair differs only in the last four
    * characters). */
  private def cleanReg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_custkey") < 400)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))

  /** Deterministically dirtied copy: the digit at 1-based position
    * 15 + (id mod 4) is bumped (d+1 mod 10) — exactly one
    * substitution, always within the last four characters, so the
    * two omission passes below (chars 15-16 / chars 17-18) provably
    * cover every mutation. Same arithmetic in the oracle SQL. */
  private def dirtyReg(s: SparkSession, dir: String): DataFrame =
    cleanReg(s, dir).select(
      (col("id") + 100000L).as("id"),
      concat(
        expr("substring(name, 1, 14 + (id % 4))"),
        expr("cast((cast(substring(name, 15 + (id % 4), 1) as int) + 1) % 10" +
          " as string)"),
        expr("substring(name, 16 + (id % 4), 1000000)")).as("name"))

  /** Gate: link the dirtied registry back to the clean one. The
    * oracle is the brute-force cross join — blocking exactness means
    * the outputs are identical, and every dirty row must recover its
    * source at distance 1. */
  def linkGate(s: SparkSession, dir: String): DataFrame =
    blockedLink(dirtyReg(s, dir), cleanReg(s, dir),
      omit = Seq((15, 2), (17, 2)), maxDist = 1)

  val linkSql: String =
    """WITH clean AS (
      |  SELECT c_custkey AS id, c_name AS name
      |  FROM customer WHERE c_custkey < 400),
      |dirty AS (
      |  SELECT c.id + 100000 AS id,
      |    substr(c.name, 1, 14 + (c.id % 4))
      |      || CAST((CAST(substr(c.name, 15 + (c.id % 4), 1) AS INTEGER) + 1)
      |              % 10 AS VARCHAR)
      |      || substr(c.name, 16 + (c.id % 4)) AS name
      |  FROM clean c)
      |SELECT d.id AS dirty_id, c.id AS clean_id,
      |  CAST(levenshtein(d.name, c.name) AS BIGINT) AS lev
      |FROM dirty d, clean c
      |WHERE levenshtein(d.name, c.name) <= 1
      |ORDER BY dirty_id, clean_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "link_blocked" -> (linkGate _))

  def oracle: Map[String, String] = Map(
    "link_blocked" -> linkSql)
}
