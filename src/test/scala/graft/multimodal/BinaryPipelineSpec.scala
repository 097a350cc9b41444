package graft.multimodal

import graft.SparkSpec

class BinaryPipelineSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val rows = media.collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf001).count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video")(r.media_type))
      assert(r.payload.length.toLong == r.n_bytes)
    }
  }

  test("feature extraction is deterministic over mapPartitions batches") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val f1 = BinaryPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = BinaryPipeline.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    f1.foreach { f =>
      assert(f.width >= 1 && f.height >= 1 && f.n_frames >= 1)
      if (f.media_type == "image") assert(f.n_frames == 1)
    }
  }

  test("resize bounds every payload and keeps metadata consistent") {
    val resized = BinaryPipeline.resize(
      BinaryPipeline.mediaTable(spark, sf001), maxBytes = 128).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.payload.length <= 128)
      assert(r.n_bytes == r.payload.length.toLong)
      assert(r.payload.length > 0)
    }
  }

  test("frame sampling emits stride-spaced frames for non-image media") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val frames = BinaryPipeline.sampleFrames(media, stride = 64)
    val perMedia = frames.groupBy("media_id").count().collect()
    assert(perMedia.nonEmpty)
    val features = BinaryPipeline.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    perMedia.foreach { r =>
      val f = features(r.getAs[Long]("media_id"))
      assert(f.media_type != "image")
      // ceil(n_bytes / stride) frames per media
      assert(r.getAs[Long]("count") == (f.n_bytes + 63) / 64)
    }
  }
}
