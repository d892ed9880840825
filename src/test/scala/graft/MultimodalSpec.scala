package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch shape, null handling, determinism.
  * (Codec itself is the documented deterministic stub.) */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeAndFeaturize appends meta+features structs with the declared schema") {
    val media = Multimodal.syntheticMediaTable(spark, 20)
    val out = Multimodal.decodeAndFeaturize(media, batchSize = 8)
    assert(out.schema("meta").dataType === Multimodal.MediaMetaSchema)
    assert(out.schema("features").dataType === Multimodal.FeatureSchema)
    assert(out.count() === 20)
    assert(out.filter($"features.decoded_ok").count() === 20)
    // header decode: width = (id%64+1)*16
    val r0 = out.filter($"media_id" === 0).select($"meta.width").as[Int].head()
    assert(r0 === 16)
  }

  test("decode is deterministic across repartitioning (batch boundaries move)") {
    val media = Multimodal.syntheticMediaTable(spark, 50)
    val a = Multimodal.decodeAndFeaturize(media, batchSize = 7)
      .select("media_id", "features.checksum").as[(Long, Long)].collect().toMap
    val b = Multimodal.decodeAndFeaturize(media.repartition(13), batchSize = 3)
      .select("media_id", "features.checksum").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("null/short payloads decode as failed, not crash") {
    val df = Seq((1L, Array[Byte](5)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeAndFeaturize(df)
    assert(out.filter($"features.decoded_ok").count() === 0)
    assert(out.count() === 2)
  }

  test("sampleFrames explodes every nth frame index") {
    val df = Seq((1L, 10)).toDF("media_id", "n_frames")
    val frames = Multimodal.sampleFrames(df, col("n_frames"), everyNth = 3)
      .select("frame_index").as[Int].collect().toSeq
    assert(frames === Seq(0, 3, 6, 9))
  }
}
