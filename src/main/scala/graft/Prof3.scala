package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the dbscanLsh pipeline at
  * sf0.1 to locate the 13–16 s tail (round-8 verdict task 2). */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.VectorExpressions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time2(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[prof3] $name%-28s cold $cold%7.2fs  warm $warm%7.2fs")
    }
    import graft.ops.Similarity.{dot, norm}
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n", norm(col("v")))
    val dim = 64
    val nTables = 32; val bits = 3
    val planes: IndexedSeq[Array[Double]] =
      for (t <- 0 until nTables; b <- 0 until bits) yield
        Array.tabulate(dim) { d =>
          org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
            org.apache.spark.sql.catalyst.expressions.Literal(t * 1000 + b),
            org.apache.spark.sql.catalyst.expressions.Literal(d)), 42L)
            .eval(null).asInstanceOf[Long].toDouble / Long.MaxValue.toDouble
        }
    val bucketCols = (0 until nTables).map { t =>
      (0 until bits).map { b =>
        when(dot(col("v"), lit(planes(t * bits + b))) > 0.0,
          shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_)).as(s"_bkt$t")
    }
    val sig = base.select(col("vec_id"), col("v"), col("n"),
      posexplode(array(bucketCols: _*)).as(Seq("table", "bucket")))
    val sigIds = base.select(col("vec_id"),
      posexplode(array(bucketCols: _*)).as(Seq("table", "bucket")))

    time2("signatures") { sig.write.format("noop").mode("overwrite").save() }
    val joined = sig.toDF("id_a", "va", "na", "table", "bucket")
      .hint("shuffle_hash")
      .join(sig.toDF("id_b", "vb", "nb", "table", "bucket"),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
    time2("join_count_only") { println("  rows=" + joined.count()) }
    val joinedIds = sigIds.toDF("id_a", "table", "bucket")
      .hint("shuffle_hash")
      .join(sigIds.toDF("id_b", "table", "bucket"),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
    time2("join_ids_count") { println("  rows=" + joinedIds.count()) }
    val verified = joined
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.35)
      .select(col("id_a"), col("id_b"))
    time2("join_verify") { verified.write.format("noop").mode("overwrite").save() }
    val cand = verified.distinct()
    time2("join_verify_distinct") { cand.write.format("noop").mode("overwrite").save() }
    time2("full_dbscan_lsh") {
      graft.ops.Similarity.dbscanLsh(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    time2("full_dbscan_exact") {
      graft.ops.Similarity.dbscan(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // downstream alone, fed by a pre-materialized pair cache
    val nbrs = cand
      .select(explode(array(
        struct(col("id_a"), col("id_b")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b")))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .cache()
    time2("nbrs_materialize") { println("  nbrs=" + nbrs.count()) }
    time2("downstream_only") {
      val m = classOf[graft.ops.Similarity.type]
        .getDeclaredMethods.find(_.getName.contains("dbscanDownstream")).get
      m.setAccessible(true)
      m.invoke(graft.ops.Similarity, base, nbrs, Integer.valueOf(3))
        .asInstanceOf[org.apache.spark.sql.DataFrame]
        .write.format("noop").mode("overwrite").save()
    }
    // piecewise downstream
    val cores = nbrs.groupBy(col("id_a")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 3).select(col("id_a").as("id"))
    time2("cores") { println("  cores=" + cores.count()) }
    val coreEdges = nbrs
      .join(broadcast(cores.select(col("id").as("id_a"))), "id_a")
      .join(broadcast(cores.select(col("id").as("id_b"))), "id_b")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    time2("coreEdges") { println("  coreEdges=" + coreEdges.count()) }
    time2("componentsOver") {
      println("  comp=" + graft.ops.Dedup.componentsOver(
        cores, coreEdges).count())
    }
    // A/B: identical downstream fed by the EXACT path's pair frame
    val a2 = base.toDF("id_a", "va", "na").repartition(32)
    val b2 = base.toDF("id_b", "vb", "nb")
    val nbrsExact = a2.crossJoin(broadcast(b2))
      .filter(col("id_a") =!= col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.35)
      .select(col("id_a"), col("id_b"))
      .cache()
    println("  nbrsExact=" + nbrsExact.count() +
      " parts=" + nbrsExact.rdd.getNumPartitions)
    println("  nbrsLsh parts=" + nbrs.rdd.getNumPartitions)
    val coresE = nbrsExact.groupBy(col("id_a")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 3).select(col("id_a").as("id"))
    val coreEdgesE = nbrsExact
      .join(broadcast(coresE.select(col("id").as("id_a"))), "id_a")
      .join(broadcast(coresE.select(col("id").as("id_b"))), "id_b")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    time2("componentsOver_exactShape") {
      println("  comp=" + graft.ops.Dedup.componentsOver(
        coresE, coreEdgesE).count())
    }
    // per-round timing of the propagation loop (LSH-shaped input)
    locally {
      val edges = coreEdges
        .select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .cache()
      println("  edge parts=" + edges.rdd.getNumPartitions +
        " rows=" + edges.count())
      var labels = cores.withColumn("label", col("id")).localCheckpoint()
      println("  label parts=" + labels.rdd.getNumPartitions)
      var prevSum = -1L
      var iter = 0
      var done = false
      while (!done && iter < 25) {
        val t0 = System.nanoTime()
        val prop = edges
          .join(labels, col("src") === col("id"))
          .select(col("dst").as("id"), col("label"))
          .union(labels)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .localCheckpoint()
        val s = prop.agg(coalesce(sum(col("label")), lit(0L)))
          .head().getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  round $iter%2d  $dt%6.2fs  sum=$s  parts=" +
          prop.rdd.getNumPartitions)
        done = s == prevSum
        prevSum = s
        labels = prop
        iter += 1
      }
    }
    spark.stop()
  }
}
