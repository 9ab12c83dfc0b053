package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Structured Streaming execution of the same transforms the batch
  * gate verifies: file source → transform → memory sink, then
  * compared against the batch run on identical data. */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val batchEvents = Tables.events(spark, dir).cache()

  /** The events table materialized to a plain-micros parquet dir the
    * file stream source can read without the nanos legacy conf. */
  private lazy val eventsPath: String = {
    val p = tmpDir("stream_events")
    batchEvents.write.mode("overwrite").parquet(p)
    p
  }

  private def streamed(name: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Complete()) = {
    val schema = spark.read.parquet(eventsPath).schema
    EventStreams.runAsStream(spark, eventsPath, schema, name, transform, mode)
  }

  test("tumbling window counts: stream == batch") {
    val stream = streamed("t_tumbling", EventStreams.tumblingCounts(_))
    val batch = EventStreams.tumblingCounts(batchEvents)
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("session window counts: stream == batch") {
    val stream = streamed("t_session", EventStreams.sessionCounts(_))
    val batch = EventStreams.sessionCounts(batchEvents)
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty)
  }

  test("trending top-k: rank over the live sink == batch trending") {
    // production wiring: the STREAM maintains the windowed counts
    // (complete mode into the serving sink); the top-k rank is a view
    // applied to the sink at read time
    val sink = streamed("t_trending", EventStreams.tumblingCounts(_))
    val served = EventStreams.rankWindows(
      sink.select("window_start", "event_type", "n"), k = 2)
    val batch = EventStreams.trendingTopK(batchEvents, k = 2)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty)
  }

  test("stream-static enrichment join: stream == batch") {
    val customers = Tables.customer(spark, dir)
    val stream = streamed("t_enrich",
      EventStreams.enrichedSegmentTotals(_, customers))
    val batch = EventStreams.enrichedSegmentTotals(batchEvents, customers)
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("dropDuplicatesWithinWatermark dedups a doubled stream (append)") {
    val doubled = tmpDir("stream_doubled")
    batchEvents.write.mode("overwrite").parquet(doubled)
    batchEvents.write.mode("append").parquet(doubled)
    val schema = spark.read.parquet(doubled).schema
    val out = EventStreams.runAsStream(spark, doubled, schema, "t_dedup",
      EventStreams.dedupEventsStreaming(_), OutputMode.Append())
    assert(out.count() == batchEvents.select("event_id").distinct().count())
  }

  test("windowed distinct users: chained dedup+agg stream == closed batch windows") {
    // Two chained stateful operators (dropDuplicates → windowed agg) in
    // Append mode: only windows whose end the final watermark passed
    // (max ts − 10 min) may have emitted; the batch replay restricted
    // to that closed set must match exactly.
    val out = streamed("t_wdistinct",
      EventStreams.windowDistinctUsers(_), OutputMode.Append())
    val maxTs = batchEvents.agg(max(col("ts"))).head.getTimestamp(0)
    val wm = java.sql.Timestamp.from(maxTs.toInstant.minusSeconds(600))
    val closed = EventStreams.windowDistinctUsers(batchEvents)
      .filter(col("window_start") + expr("INTERVAL 5 MINUTES") <= lit(wm))
    assert(out.count() == closed.count())
    assert(out.exceptAll(closed).isEmpty && closed.exceptAll(out).isEmpty)
  }

  test("checkpointed file sink resumes exactly-once across restarts") {
    val in = tmpDir("ckpt_in")
    val out = tmpDir("ckpt_out")
    val ck = tmpDir("ckpt_state")
    val schema = spark.read.parquet(eventsPath).schema
    batchEvents.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(in)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // new data arrives while the query is down; the restart must pick
    // up ONLY the unprocessed files (exactly-once via the checkpoint
    // + the sink's transactional file log)
    batchEvents.filter(col("event_id") % 2 === 1)
      .write.mode("append").parquet(in)
    runOnce()
    val result = spark.read.parquet(out)
    assert(result.count() == batchEvents.count())
    assert(result.select("event_id").distinct().count() ==
      batchEvents.count())
  }

  test("stream-stream interval join: stream == batch") {
    val stream = streamed("t_interval",
      EventStreams.intervalJoin(_, "view", "purchase"), OutputMode.Append())
    val batch = EventStreams.intervalJoin(batchEvents, "view", "purchase")
    assert(stream.count() == batch.count() && batch.count() > 0)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("left-outer interval join emits the miss once the watermark passes") {
    import spark.implicits._
    val src = tmpDir("outer_join_src")
    def write(rows: Seq[(Long, String, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)
    // batch 1: one matched view (user 2) and one that will never match
    write(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 00:00:00", 2L, "view", 1.0),
      (3L, "2024-01-01 01:00:00", 2L, "purchase", 5.0)))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = EventStreams.intervalJoin(stream, "view", "purchase",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("t_outer")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // later batches push the watermark far past a_ts + 4h + 10min;
      // the watermark visible to batch N is computed from batch N-1,
      // so two advancing batches guarantee the miss row flushes
      // the advancing rows must SURVIVE the event_type filters (the
      // watermark node sits behind them), and both sides' watermarks
      // must move — so each batch carries a view AND a purchase on
      // disjoint users
      Seq("2024-01-02 00:00:00", "2024-01-02 00:30:00")
        .zipWithIndex.foreach { case (ts, i) =>
          write(Seq(
            (20L + 2 * i, ts, 40L + i, "view", 0.0),
            (21L + 2 * i, ts, 50L + i, "purchase", 0.0)))
          q.processAllAvailable()
        }
    } finally q.stop()
    val out = spark.table("t_outer")
    assert(out.filter($"a_id" === 2L && $"b_id" === 3L).count() == 1,
      "matched pair present")
    assert(out.filter($"a_id" === 1L && $"b_id".isNull).count() == 1,
      s"unmatched view must emit one null row:\n${out.collect().mkString("\n")}")
  }

  test("flatMapGroupsWithState: running per-user totals reach batch totals") {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = EventStreams.runningUserTotals(
        stream.select($"event_id", $"ts", $"user_id", $"event_type",
          $"value").as[EventStreams.Event])
      .writeStream.format("memory").queryName("t_state")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // final state per user (last emitted row) must equal batch agg
    val finalState = spark.table("t_state")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n_events"))
    val batch = batchEvents.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalState.exceptAll(batch).isEmpty)
  }
}
