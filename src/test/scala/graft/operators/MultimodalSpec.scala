package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{MediaRow, StubDecoder}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta is deterministic and partition-parallel") {
    val rows = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "video", Array[Byte](9, 8, 7)),
      MediaRow(3L, "audio", Array.fill(100)(42.toByte)))
    val ds = spark.createDataset(rows).repartition(3)
    val got = Multimodal.decodeMeta(ds).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).n_bytes == 4L)
    assert(got(1L).format == "stub/image")
    assert(got(1L).n_frames == 1)
    assert(got(2L).n_frames > 1)
    // determinism: same bytes → same fake dims
    val again = Multimodal.decodeMeta(spark.createDataset(rows)).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L) == again(1L) && got(2L) == again(2L))
  }

  test("frameSamplePlan expands every k-th frame for videos only") {
    val meta = Seq(
      Multimodal.MediaMeta(1L, "video", 10L, 64, 64, 90, "stub/video"),
      Multimodal.MediaMeta(2L, "image", 10L, 64, 64, 1, "stub/image"))
    val got = Multimodal.frameSamplePlan(spark.createDataset(meta), every = 30)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 0L), (1L, 30L), (1L, 60L)))
  }

  test("fromDirectory builds a distributed media table") {
    val ds = Multimodal.fromDirectory(spark, "src/test/resources/fixture_generic/extras", "image")
    val metas = Multimodal.decodeMeta(ds).collect()
    assert(metas.length == 1)
    assert(metas.head.n_bytes > 0)
  }
  test("resizeAll and extractFeatures keep the partition-parallel batch shape") {
    import Multimodal.MediaRow
    val rows = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "image", Array[Byte](9, 8, 7)))
    val ds = spark.createDataset(rows).repartition(2)
    val resized = Multimodal.resizeAll(ds, 224, 224).collect().map(r => r.media_id -> r).toMap
    assert(resized(1L).width == 224 && resized(1L).height == 224)
    assert(new String(resized(1L).bytes.take(22), "UTF-8") == "stub-resize/image/224x")
    val feats = Multimodal.extractFeatures(ds, dim = 8).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).embedding.length == 8)
    assert(feats(1L).embedding.forall(v => v >= -0.5f && v <= 0.5f))
    // deterministic and input-sensitive
    val again = Multimodal.extractFeatures(spark.createDataset(rows), dim = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).embedding.toSeq == again(1L).embedding.toSeq)
    assert(feats(1L).embedding.toSeq != feats(2L).embedding.toSeq)
  }
}