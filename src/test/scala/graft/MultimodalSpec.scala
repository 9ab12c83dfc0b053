package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media table: binary payload + typed metadata, kinds cycle") {
    val m = Multimodal.mediaTable(spark, dir)
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val kinds = m.select("kind").distinct().collect().map(_.getString(0))
    assert(kinds.toSet == Set("image", "audio", "video"))
    // n_bytes metadata consistent with the payload itself
    assert(m.filter(length(col("payload")).cast("long") =!=
      col("n_bytes")).count() == 0)
  }

  test("stub decoder: deterministic, normalized 16-bin histogram") {
    val f1 = Multimodal.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.FakeDecoder.Dim)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.FakeDecoder.decode(Array.empty[Byte]).sum == 0f)
  }

  test("feature extraction via mapPartitions: shape and determinism") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 500)
    assert(feats.filter(_.dim != Multimodal.FakeDecoder.Dim).count() == 0)
    // run twice → identical (deterministic stub, no RNG)
    val again = Multimodal.extractFeatures(media)
    assert(feats.toDF().exceptAll(again.toDF()).isEmpty)
  }

  test("frame sampling explodes video payloads at fixed stride") {
    val media = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 128)
    val videos = media.filter(col("kind") === "video")
    // every video contributes ceil(n_bytes / stride) frames
    val expected = videos
      .select(sum(ceil(col("n_bytes") / 128.0).cast("long"))).collect()(0)
      .getLong(0)
    assert(frames.count() == expected)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_no", "frame"))
  }
}
