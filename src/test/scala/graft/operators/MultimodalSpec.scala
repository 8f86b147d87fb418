package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{MediaRow, StubDecoder}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def gray(x: Int, y: Int): Int = (x * 31 + y * 17) % 256

  test("real PNG round trip: encode → ImageIO decode recovers geometry and every pixel") {
    val png = MediaCodec.encodePng(13, 7, gray)
    // PNG magic — this is a real container, not a fake payload
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val d = MediaCodec.analyzeImage(png)
    assert(d.width == 13 && d.height == 7 && d.nFrames == 1 && d.format == "png")
    val expected = (for (y <- 0 until 7; x <- 0 until 13) yield gray(x, y).toLong).sum
    assert(d.checksum == expected)
  }

  test("real WAV round trip: encode → javax.sound decode recovers frames and samples") {
    val samples = Array.tabulate(1234)(i => ((i * 7 + 5) % 256).toByte)
    val wav = MediaCodec.encodeWav(8000f, samples)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val d = MediaCodec.analyzeAudio(wav)
    assert(d.nFrames == 1234 && d.format == "wav")
    assert(d.checksum == samples.map(_ & 0xff).map(_.toLong).sum)
  }

  test("real multi-frame GIF round trip: frame count and first-frame pixels decode") {
    val gifBytes = MediaCodec.encodeGif(7, 5, nFrames = 3,
      (f, x, y) => (f * 50 + x * 31 + y * 17) % 256)
    assert(new String(gifBytes.take(3), "US-ASCII") == "GIF")
    val d = MediaCodec.analyzeImage(gifBytes)
    assert(d.width == 7 && d.height == 5 && d.format == "gif")
    assert(d.nFrames == 3)
    val frame0 = (for (y <- 0 until 5; x <- 0 until 7) yield ((x * 31 + y * 17) % 256).toLong).sum
    assert(d.checksum == frame0)
  }

  test("JdkMediaDecoder dispatches image/audio to real codecs, video to the stub") {
    val png = MediaCodec.encodePng(4, 4, gray)
    val img = Multimodal.JdkMediaDecoder.analyze("image", png)
    assert(img.format == "png" && img.width == 4)
    val wav = MediaCodec.encodeWav(8000f, Array[Byte](1, 2, 3))
    val aud = Multimodal.JdkMediaDecoder.analyze("audio", wav)
    assert(aud.format == "wav" && aud.nFrames == 3)
    val vid = Multimodal.JdkMediaDecoder.analyze("video", Array[Byte](9, 8, 7))
    assert(vid.format == "stub/video" && vid.nFrames > 1)
  }

  test("decodeMeta is deterministic and partition-parallel over real payloads") {
    val rows = Seq(
      MediaRow(1L, "image", MediaCodec.encodePng(9, 5, gray)),
      MediaRow(2L, "video", Array[Byte](9, 8, 7)),
      MediaRow(3L, "audio", MediaCodec.encodeWav(8000f, Array.fill(100)(42.toByte))))
    val ds = spark.createDataset(rows).repartition(3)
    val got = Multimodal.decodeMeta(ds).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).width == 9 && got(1L).height == 5 && got(1L).format == "png")
    assert(got(1L).n_frames == 1)
    assert(got(2L).n_frames > 1) // stub video path
    assert(got(3L).n_frames == 100 && got(3L).format == "wav")
    val again = Multimodal.decodeMeta(spark.createDataset(rows)).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L) == again(1L) && got(2L) == again(2L))
  }

  test("stub decoder stays available behind the same trait for external-codec kinds") {
    val d = StubDecoder.analyze("video", Array[Byte](1, 2, 3, 4))
    val again = StubDecoder.analyze("video", Array[Byte](1, 2, 3, 4))
    assert(d == again && d.nFrames > 1 && d.checksum == 4L)
  }

  test("frameSamplePlan expands every k-th frame for videos only") {
    val meta = Seq(
      Multimodal.MediaMeta(1L, "video", 10L, 64, 64, 90, "stub/video"),
      Multimodal.MediaMeta(2L, "image", 10L, 64, 64, 1, "png"))
    val got = Multimodal.frameSamplePlan(spark.createDataset(meta), every = 30)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 0L), (1L, 30L), (1L, 60L)))
  }

  test("fromDirectory builds a distributed media table") {
    val ds = Multimodal.fromDirectory(spark, "src/test/resources/fixture_generic/extras", "image")
    val metas = Multimodal.decodeMeta(ds, StubDecoder).collect()
    assert(metas.length == 1)
    assert(metas.head.n_bytes > 0)
  }

  test("resizeAll does a real bilinear resize; nearest-neighbor resize is pixel-exact") {
    val src = MediaCodec.encodePng(16, 12, gray)
    val rows = Seq(MediaRow(1L, "image", src))
    val ds = spark.createDataset(rows).repartition(2)
    val resized = Multimodal.resizeAll(ds, 224, 224).collect().head
    val meta = MediaCodec.analyzeImage(resized.bytes)
    assert(meta.width == 224 && meta.height == 224 && meta.format == "png")
    // determinism of the production path
    val again = Multimodal.resizeAll(spark.createDataset(rows), 224, 224).collect().head
    assert(resized.bytes.toSeq == again.bytes.toSeq)
    // nearest-neighbor: every destination pixel equals its mapped source pixel
    val nn = MediaCodec.analyzeImage(MediaCodec.resizeNearest(src, 5, 3))
    val expected = (for (y <- 0 until 3; x <- 0 until 5)
      yield gray(x * 16 / 5, y * 12 / 3).toLong).sum
    assert(nn.width == 5 && nn.height == 3 && nn.checksum == expected)
  }

  test("extractFeatures keeps the partition-parallel batch shape") {
    val rows = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "image", Array[Byte](9, 8, 7)))
    val ds = spark.createDataset(rows).repartition(2)
    val feats = Multimodal.extractFeatures(ds, dim = 8).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).embedding.length == 8)
    assert(feats(1L).embedding.forall(v => v >= -0.5f && v <= 0.5f))
    val again = Multimodal.extractFeatures(spark.createDataset(rows), dim = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).embedding.toSeq == again(1L).embedding.toSeq)
    assert(feats(1L).embedding.toSeq != feats(2L).embedding.toSeq)
  }

  test("aHash64: deterministic, scale-invariant, brightness-invariant, content-sensitive") {
    val base = MediaCodec.encodePng(16, 12, gray)
    val h = MediaCodec.aHash64(base)
    // identical bytes → identical hash
    assert(MediaCodec.aHash64(base) == h)
    // 2× nearest upscale is hash-invariant: the 8×8 resample indices
    // satisfy floor(floor(2a)/2) = floor(a), so the sampled raster is
    // identical — the property that makes aHash a RESOLUTION-blind dedup key
    val up = MediaCodec.resizeNearest(base, 32, 24)
    assert(MediaCodec.aHash64(up) == h)
    // uniform brightness shift (no wraparound) moves mean and values
    // together → same threshold pattern
    val brighter = MediaCodec.encodePng(16, 12, (x, y) => gray(x, y) % 128 + 40)
    val dimmer = MediaCodec.encodePng(16, 12, (x, y) => gray(x, y) % 128)
    assert(MediaCodec.aHash64(brighter) == MediaCodec.aHash64(dimmer))
    // different content → different hash
    val checker = MediaCodec.encodePng(16, 12, (x, y) => ((x + y) % 2) * 255)
    assert(MediaCodec.aHash64(checker) != h)
  }

  test("dHash64: monotone gradients give all-ones / all-zeros hashes") {
    val inc = MediaCodec.encodePng(9, 8, (x, _) => x * 20)
    val dec = MediaCodec.encodePng(9, 8, (x, _) => 160 - x * 20)
    assert(MediaCodec.dHash64(inc) == -1L)
    assert(MediaCodec.dHash64(dec) == 0L)
  }

  test("dHash64 is invariant to a uniform brightness shift") {
    val a = MediaCodec.encodePng(12, 10, (x, y) => (x * 13 + y * 7) % 200)
    val b = MediaCodec.encodePng(12, 10, (x, y) => (x * 13 + y * 7) % 200 + 40)
    assert(MediaCodec.dHash64(a) == MediaCodec.dHash64(b))
  }
}
