package graft.ops

import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, UpdateSketch, Union}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Theta-sketch set-operation cardinality — the audience-overlap
  * query HLL cannot answer: HLL unions losslessly but cannot
  * INTERSECT, while theta sketches keep a uniform hash sample below a
  * threshold θ, so intersection/difference of sketches estimate the
  * cardinality of the corresponding set operations. "How many users
  * both viewed AND purchased" over 100 TB of events = two sketch
  * scans + a driver-side set operation on KB-sized summaries.
  *
  * Plan shape: per partition, one `UpdateSketch` absorbs that
  * partition's user ids (mapPartitions — the legitimate imperative
  * per-partition case); the ≤ `lgK`-bounded compact sketches (≤32
  * partitions × ≤512 KB) are collected and union-merged on the
  * driver, exactly like the CMS and IVF-centroid collects. Raw rows
  * never shuffle at all — the only movement is sketch blobs.
  *
  * Determinism: sketches stay in EXACT mode while the per-partition
  * distinct count is ≤ 2^lgK (θ = 1, every hash retained), making
  * union/intersection estimates exactly the true cardinalities and
  * the gate hash-stable; lgK = 16 keeps gate scales exact, and at
  * true scale the same code degrades gracefully to ±1.6% estimates.
  */
object Sketches {

  private def sketchOf(df: DataFrame, lgK: Int): CompactSketch = {
    val parts: Array[Array[Byte]] = df
      .select(col("user_id"))
      .rdd.mapPartitions { it =>
        val sk = UpdateSketch.builder().setLogNominalEntries(lgK).build()
        it.foreach(r => sk.update(r.getLong(0)))
        Iterator.single(sk.compact().toByteArray)
      }.collect()
    val u: Union = SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()
    parts.foreach(b => u.union(CompactSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(b))))
    u.getResult
  }

  /** view ∩ purchase audience overlap, with the exact anchors. */
  def thetaOverlap(s: SparkSession, dir: String, lgK: Int = 16)
      : DataFrame = {
    val ev = Tables.events(s, dir)
    val view = sketchOf(ev.filter(col("event_type") === "view"), lgK)
    val buy = sketchOf(ev.filter(col("event_type") === "purchase"), lgK)
    val inter: Intersection = SetOperation.builder().buildIntersection()
    inter.intersect(view)
    inter.intersect(buy)
    val both = inter.getResult
    val row = Row(
      math.rint(view.getEstimate).toLong,
      math.rint(buy.getEstimate).toLong,
      math.rint(both.getEstimate).toLong)
    s.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(row)),
      StructType(Seq(
        StructField("n_view", LongType),
        StructField("n_purchase", LongType),
        StructField("n_both", LongType))))
  }

  val thetaOverlapSql: String =
    """SELECT
      |  COUNT(DISTINCT CASE WHEN event_type = 'view'
      |    THEN user_id END) AS n_view,
      |  COUNT(DISTINCT CASE WHEN event_type = 'purchase'
      |    THEN user_id END) AS n_purchase,
      |  (SELECT COUNT(*) FROM
      |    (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      |     INTERSECT
      |     SELECT DISTINCT user_id FROM events
      |     WHERE event_type = 'purchase')) AS n_both
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_theta_overlap" -> ((s, d) => thetaOverlap(s, d)))

  def oracle: Map[String, String] = Map(
    "sketch_theta_overlap" -> thetaOverlapSql)
}
