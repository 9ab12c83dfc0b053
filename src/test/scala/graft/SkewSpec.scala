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

  test("AQE runtime skew-join split fires on a skewed sort-merge join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // Documented production path: AQE's skewJoin splits oversized
    // shuffle partitions at runtime — salting (above) is only for the
    // shapes AQE can't touch. This asserts the split actually FIRES:
    // the executed adaptive plan must contain a join with
    // isSkewJoin=true. Thresholds are lowered so a ~10 MB hot
    // partition counts as skewed in a test-sized shuffle.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 75% on one key, ~64B incompressible payload each —
      // the hot key's shuffle partition dwarfs the median
      val left = spark.range(200000)
        .select(
          when($"id" < 150000, 0L).otherwise($"id" % 199 + 1).as("k"),
          concat(md5($"id".cast("string")),
            md5(($"id" + 1).cast("string"))).as("pay"))
      val right = spark.range(0, 200).toDF("k")
        .withColumn("name", md5($"k".cast("string")))
      // sum(length(pay)) keeps the payload alive through the shuffle
      // (a bare count would let column pruning shrink the hot side)
      val acted = left.join(right, "k")
        .select(sum(length($"pay")).as("bytes"))
      // collect(), NOT head(): head() executes a separate limit(1)
      // QueryExecution, leaving THIS adaptive plan un-finalized
      assert(acted.collect()(0).getLong(0) == 200000L * 64)
      val adaptive = acted.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an adaptive plan")
      // query stages are leaf nodes — descend into them explicitly
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case _                 => p.children.flatMap(allNodes)
      })
      val skewed = allNodes(adaptive.get.executedPlan).collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
        case j: ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty,
        s"AQE skew-join did not fire; executed plan:\n${adaptive.get.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    // The 100 TB shuffle-join shape: a huge fact scan joined to a dim
    // with a selective predicate. Spark's InjectRuntimeFilter can
    // build a bloom filter from the dim side and apply it to the fact
    // side BEFORE the join shuffle, cutting the exchanged bytes by the
    // dim's selectivity. This asserts the rewrite actually fires on
    // that shape (thresholds lowered to test scale) and that it is
    // semantics-preserving.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 500000.0) // selective
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val hasBloom = joined.queryExecution.optimizedPlan.collectFirst {
        case p if p.expressions.exists(_.exists(
          _.isInstanceOf[BloomFilterMightContain])) => p
      }
      assert(hasBloom.isDefined,
        s"no bloom filter injected:\n${joined.queryExecution.optimizedPlan}")
      // rewrite is semantics-preserving
      val expected = fact.join(dim.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
