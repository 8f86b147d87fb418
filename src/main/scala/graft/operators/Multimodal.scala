package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import java.util.ServiceLoader

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (training-data-pipeline mandate): media
  * payloads are opaque `binary` columns with typed metadata columns
  * alongside. The Spark-side plumbing — schema, partition-parallel batch
  * decode via `mapPartitions`, metadata projection — is production-shaped,
  * and the codecs are REAL for images and audio using JDK-bundled
  * libraries only (`javax.imageio` decodes/encodes PNG/JPEG/GIF/BMP;
  * `javax.sound.sampled` decodes/encodes WAV/AIFF/AU). Video remains a
  * clearly-marked stub: the JDK genuinely ships no video codec, so frame
  * sampling is planned over declared frame counts and the decode boundary
  * stays injectable for an external codec.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int, n_frames: Int, format: String)

  /** Full decode result for one payload: geometry, frame count, container
    * format name, and a content checksum (sum of decoded sample values —
    * pixels for images, PCM bytes for audio), which is what round-trip
    * oracles verify: a broken decoder cannot reproduce the checksum.
    */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           format: String, checksum: Long)

  /** Codec boundary: a real implementation wraps a media library;
    * partition-level batching amortizes codec init (the Pandas-UDF batch
    * pattern, in Scala). [[JdkMediaDecoder]] is the default and is REAL
    * for image/audio kinds.
    */
  trait MediaDecoder extends Serializable {
    def analyze(kind: String, bytes: Array[Byte]): Decoded
  }

  /** Real decoder on JDK-bundled codecs only (zero dependencies):
    *   - image → `javax.imageio` (PNG, JPEG, GIF, BMP): true pixel
    *     decode; checksum = Σ red-channel values; n_frames counts images
    *     in the container (animated GIF > 1).
    *   - audio → `javax.sound.sampled` (WAV, AIFF, AU): true PCM
    *     decode; n_frames = frame count; checksum = Σ unsigned bytes of
    *     the decoded PCM stream.
    *   - video → STUB (the JDK has no video codec): deterministic
    *     byte-derived dimensions, checksum = payload length. An external
    *     codec implements the same trait and drops in.
    */
  object JdkMediaDecoder extends MediaDecoder {
    def analyze(kind: String, bytes: Array[Byte]): Decoded = kind match {
      case "image" => MediaCodec.analyzeImage(bytes)
      case "audio" => MediaCodec.analyzeAudio(bytes)
      case _       => StubDecoder.analyze(kind, bytes)
    }
  }

  /** STUB DECODER — deterministic fake for kinds the JDK cannot decode
    * (video); derives "dimensions" from the payload bytes instead of
    * decoding. Kept injectable so the pipeline shape is testable without
    * an external codec.
    */
  object StubDecoder extends MediaDecoder {
    def analyze(kind: String, bytes: Array[Byte]): Decoded = {
      val h = bytes.take(16).foldLeft(17)((a, b) => a * 31 + b)
      val w = 64 + math.abs(h % 512)
      val ht = 64 + math.abs((h / 512) % 512)
      val frames = kind match {
        case "video" => 1 + math.abs(h % 300)
        case "audio" => 1 + math.abs(h % 48000)
        case _ => 1
      }
      Decoded(w, ht, frames, s"stub/$kind", bytes.length.toLong)
    }
  }

  /** Decode media metadata partition-parallel. The decoder is created
    * once per partition (codec init amortization) and rows stream
    * through it — the `mapInPandas` batch shape, JVM-native.
    */
  def decodeMeta(media: Dataset[MediaRow], decoder: MediaDecoder = JdkMediaDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val d = decoder.analyze(row.kind, row.bytes)
        MediaMeta(row.media_id, row.kind, row.bytes.length.toLong,
          d.width, d.height, d.nFrames, d.format)
      }
    }
  }

  final case class MediaStats(media_id: Long, kind: String, width: Int, height: Int,
                              n_frames: Int, format: String, checksum: Long)

  /** Full decode with content checksum — the round-trip-verifiable
    * surface (q54): encode deterministic media, decode with the REAL
    * codec, and the checksum is independently re-derivable arithmetic.
    */
  def decodeStats(media: Dataset[MediaRow], decoder: MediaDecoder = JdkMediaDecoder): Dataset[MediaStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val d = decoder.analyze(row.kind, row.bytes)
        MediaStats(row.media_id, row.kind, d.width, d.height, d.nFrames, d.format, d.checksum)
      }
    }
  }

  /** Frame-sample plan: pick every k-th frame index per video row —
    * generator expansion, no decode needed for planning.
    */
  def frameSamplePlan(meta: Dataset[MediaMeta], every: Int = 30): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))

  final case class MediaResized(media_id: Long, kind: String, width: Int,
                                height: Int, bytes: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, embedding: Array[Float])

  /** Transform boundary for resize-class ops (bytes → bytes at a target
    * geometry). [[ImageIoTransformer]] is the real JDK implementation.
    */
  trait MediaTransformer extends Serializable {
    def resize(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** REAL resize on JDK imaging: decode via ImageIO, scale with
    * Graphics2D bilinear interpolation (the production thumbnailing
    * path), re-encode as PNG. Non-image kinds pass through unchanged
    * (resize has no meaning for raw PCM; an external codec overrides).
    */
  object ImageIoTransformer extends MediaTransformer {
    def resize(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (kind == "image") MediaCodec.resizeBilinear(bytes, w, h) else bytes
  }

  /** Resize every payload to a target geometry, partition-parallel —
    * same batch shape as [[decodeMeta]]: transformer built once per
    * partition, rows stream through, output stays a binary column.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int,
                transformer: MediaTransformer = ImageIoTransformer): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(row => MediaResized(row.media_id, row.kind, w, h,
        transformer.resize(row.kind, row.bytes, w, h)))
    }
  }

  /** Embedding boundary for feature extraction (bytes → dense float
    * vector). A real model server or ONNX runtime implements this trait
    * and is constructed once per partition.
    */
  trait FeatureExtractor extends Serializable {
    def embed(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB: deterministic byte-hash expansion in [-0.5, 0.5) — a model
    * runtime is a genuine external dependency, unlike the codecs above.
    */
  object StubFeatureExtractor extends FeatureExtractor {
    def embed(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      val emb = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      val n = math.min(bytes.length, 256)
      while (i < n) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
        emb(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
        i += 1
      }
      emb
    }
  }

  /** Feature extraction: bytes → dense float embedding, the producer for
    * the `embeddings`-table shape (ANN/dedup input) — same partition-
    * parallel batch shape as [[decodeMeta]]/[[resizeAll]].
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
                      extractor: FeatureExtractor = StubFeatureExtractor): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(row => MediaFeatures(row.media_id, row.kind,
        extractor.embed(row.kind, row.bytes, dim)))
    }
  }

  /** Build a media table from a directory of binary files: the 100 TB
    * path — `binaryFile` scan partitions by file, payload stays
    * distributed, metadata extraction happens next to the bytes.
    */
  def fromDirectory(spark: SparkSession, root: String, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(xxhash64(col("path")).as("media_id"), lit(kind).as("kind"), col("content").as("bytes"))
      .as[MediaRow]
  }
}

/** JDK-only codec kernels shared by [[Multimodal.JdkMediaDecoder]] and
  * the round-trip oracle queries. Everything here is `javax.imageio` /
  * `javax.sound.sampled` / `java.awt` — bundled with every JDK, zero
  * external dependencies.
  */
object MediaCodec {

  // ImageIO's default createImageInputStream/write path goes through a
  // DISK-backed stream cache (a temp file per encode/decode call) —
  // ruinous for per-row codec work. Payloads here are in-memory byte
  // arrays, so every entry point below builds an explicit
  // MemoryCacheImage{Input,Output}Stream instead; scoping the choice
  // per-stream (rather than ImageIO.setUseCache(false)) leaves the
  // JVM-global default untouched for other ImageIO users.

  /** Decode an image container: geometry + frame count + format name
    * from the registered ImageIO reader, pixel checksum (Σ red channel)
    * from a full raster decode of the first frame. PNG/JPEG/GIF/BMP.
    */
  def analyzeImage(bytes: Array[Byte]): Multimodal.Decoded = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for payload of ${bytes.length} bytes")
      val reader = readers.next()
      reader.setInput(iis)
      try {
        val img = reader.read(0)
        val nFrames = reader.getNumImages(true)
        Multimodal.Decoded(img.getWidth, img.getHeight, nFrames,
          reader.getFormatName.toLowerCase, pixelSum(img))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Sum of red-channel values over the full raster — gray-encoded
    * fixtures make this the plain Σ pixel-value the oracle re-derives.
    */
  def pixelSum(img: BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        s += (img.getRGB(x, y) >>> 16) & 0xff
        x += 1
      }
      y += 1
    }
    s
  }

  /** Luminance histogram of a REAL decode at native size: bucket
    * = gray·buckets/256 over the red channel (the aHash64 gray
    * convention). Returns (pixel count, dense bucket counts). */
  def grayHistogram(bytes: Array[Byte], buckets: Int): (Long, Array[Long]) = {
    val img = readImage(bytes)
    val hist = new Array[Long](buckets)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v = (img.getRGB(x, y) >>> 16) & 0xff
        hist(v * buckets / 256) += 1L
        x += 1
      }
      y += 1
    }
    (img.getWidth.toLong * img.getHeight, hist)
  }

  /** Encode a grayscale image as PNG: pixel(x, y) supplies the 8-bit
    * value, replicated across RGB. PNG is lossless, so a decode
    * round-trips to the exact generated values.
    */
  def encodePng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = pixel(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** PNG encode through an explicit in-memory output stream (see the
    * caching note above).
    */
  private def writePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val writers = ImageIO.getImageWritersByFormatName("png")
    require(writers.hasNext, "no PNG ImageIO writer on this JVM")
    val writer = writers.next()
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Encode a multi-frame grayscale GIF (the JDK GIF writer supports
    * sequences) — exercises the n_frames-greater-than-one decode path
    * with a real container: [[analyzeImage]]'s `getNumImages(true)`
    * counts the frames and the checksum reads frame 0. Grayscale fits a
    * 256-color palette exactly, so pixel values round-trip.
    */
  def encodeGif(w: Int, h: Int, nFrames: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val writers = ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF ImageIO writer on this JVM")
    val writer = writers.next()
    try {
      writer.setOutput(ios)
      require(writer.canWriteSequence, "GIF writer cannot write sequences")
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = pixel(f, x, y) & 0xff
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Image decode through an explicit in-memory input stream. */
  private def readImage(bytes: Array[Byte]): BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for payload of ${bytes.length} bytes")
      val reader = readers.next()
      reader.setInput(iis)
      try reader.read(0) finally reader.dispose()
    } finally iis.close()
  }

  // `AudioSystem`'s static entry points re-resolve SPI providers through
  // a synchronized registry on EVERY call — measured ~20× slowdown at 32
  // concurrent decode threads. Resolve the providers once per JVM via
  // the public `javax.sound.sampled.spi` interfaces and dispatch
  // directly; same real JDK codecs, no global lock in the hot path.
  // The soft-MIDI reader probes by attempting a full sequence parse
  // (~30× the header-sniff cost of the container readers, with internal
  // locking) and precedes WaveFileReader in provider order — try it
  // last; a miss still falls through to every provider.
  private lazy val audioReaders: List[AudioFileReader] =
    ServiceLoader.load(classOf[AudioFileReader]).asScala.toList
      .sortBy(r => if (r.getClass.getName.contains("Midi")) 1 else 0)
  private lazy val audioWriters: List[AudioFileWriter] =
    ServiceLoader.load(classOf[AudioFileWriter]).asScala.toList

  /** test-visible probes for the concurrency micro-benchmark */
  private[graft] def probeAudioFileFormat(bytes: Array[Byte]): AudioFileFormat = audioFileFormat(bytes)
  private[graft] def probeAudioInputStream(bytes: Array[Byte]): AudioInputStream = audioInputStream(bytes)

  private def audioFileFormat(bytes: Array[Byte]): AudioFileFormat = {
    audioReaders.foreach { r =>
      try return r.getAudioFileFormat(new ByteArrayInputStream(bytes))
      catch { case _: UnsupportedAudioFileException => }
    }
    throw new UnsupportedAudioFileException(s"no audio reader for payload of ${bytes.length} bytes")
  }

  private def audioInputStream(bytes: Array[Byte]): AudioInputStream = {
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: UnsupportedAudioFileException => }
    }
    throw new UnsupportedAudioFileException(s"no audio reader for payload of ${bytes.length} bytes")
  }

  /** Decode an audio container via the JDK audio SPI: frame count from
    * the stream, format name from the file-format probe, checksum =
    * Σ unsigned bytes of the decoded PCM payload. WAV/AIFF/AU.
    */
  /** Drain a decoded audio stream chunk-by-chunk — the ONE read loop
    * both audio consumers share (n > 0 guard: AudioInputStream.read
    * returns 0, not -1, when fewer than one frame remains).
    */
  private def drainAudio(in: AudioInputStream)(f: (Array[Byte], Int) => Unit): Unit = {
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { f(buf, n); n = in.read(buf) }
  }

  def analyzeAudio(bytes: Array[Byte]): Multimodal.Decoded = {
    val fileFormat = audioFileFormat(bytes)
    val in = audioInputStream(bytes)
    try {
      var s = 0L
      var bytesRead = 0L
      drainAudio(in) { (buf, n) =>
        var i = 0
        while (i < n) { s += buf(i) & 0xff; i += 1 }
        bytesRead += n
      }
      // frame count: the declared stream length when the container
      // carries one, else derived from the decoded byte count
      // (getFrameLength is NOT_SPECIFIED = -1 for unframed containers);
      // saturate instead of wrapping on >2^31-frame streams
      val frameSize = math.max(in.getFormat.getFrameSize, 1)
      val framesLong =
        if (in.getFrameLength >= 0) in.getFrameLength else bytesRead / frameSize
      val nFrames = math.min(framesLong, Int.MaxValue.toLong).toInt
      val fmt = fileFormat.getType.toString.toLowerCase match {
        case "wave" => "wav"
        case other  => other
      }
      Multimodal.Decoded(0, 0, nFrames, fmt, s)
    } finally in.close()
  }

  /** Decode an audio container to its raw unsigned-8-bit PCM samples
    * through the real `javax.sound` stream (q103's feature source).
    */
  def decodePcm8(bytes: Array[Byte]): Array[Int] = {
    val in = audioInputStream(bytes)
    try {
      val out = new ByteArrayOutputStream()
      drainAudio(in)((buf, n) => out.write(buf, 0, n))
      out.toByteArray.map(b => b & 0xff)
    } finally in.close()
  }

  /** Encode unsigned 8-bit mono PCM samples as a WAV container. */
  def encodeWav(sampleRate: Float, samples: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, sampleRate,
      8, 1, 1, sampleRate, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    val writer = audioWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, stream))
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter on this JVM"))
    try writer.write(stream, AudioFileFormat.Type.WAVE, out) finally stream.close()
    out.toByteArray
  }

  /** Production-path resize: Graphics2D bilinear scaling, PNG re-encode.
    * Pixel values are interpolation-dependent, so correctness is pinned
    * by round-trip geometry + determinism specs, not a value oracle.
    */
  def resizeBilinear(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = readImage(bytes)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    writePng(dst)
  }

  /** Exact nearest-neighbor resize on the decoded raster:
    * dst(x, y) = src((x·sw)/dw, (y·sh)/dh) with floor integer division —
    * fully deterministic, so a resize→decode round trip is value-oracle
    * checkable (q68).
    */
  /** 64-bit average-hash (aHash) of an encoded image: decode →
    * nearest-resize to 8×8 through the REAL codec round trip (so the
    * hash witnesses both decode paths) → bit p set iff gray(p) exceeds
    * the integer mean of the 64 gray values. Every step is exact
    * integer arithmetic over the decoded raster, so the hash is
    * closed-form re-derivable for generated fixtures (q97).
    */
  /** 64-bit Walsh–Hadamard spectral hash: decode → nearest-resize to
    * 8×8 through the REAL codec round trip → 2-D Walsh–Hadamard
    * transform → bit u·8+v set iff coefficient W[u,v] > 0. The WHT is
    * the EXACT-integer member of the spectral-hash family (pHash's DCT
    * basis is irrational; the Hadamard basis is ±1), so low-sequency
    * structure is captured with zero float arithmetic:
    * W[u,v] = Σ_{x,y} gray(x,y)·(−1)^(popcount(x∧u)+popcount(y∧v)).
    */
  def wHash64(bytes: Array[Byte]): Long = {
    val img = readImage(resizeNearest(bytes, 8, 8))
    val vals = new Array[Long](64)
    var p = 0
    while (p < 64) {
      vals(p) = (img.getRGB(p % 8, p / 8) >>> 16) & 0xff
      p += 1
    }
    var hsh = 0L
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var c = 0L
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            val neg = (Integer.bitCount(x & u) + Integer.bitCount(y & v)) & 1
            c += (if (neg == 1) -vals(y * 8 + x) else vals(y * 8 + x))
            y += 1
          }
          x += 1
        }
        if (c > 0) hsh |= 1L << (u * 8 + v)
        v += 1
      }
      u += 1
    }
    hsh
  }

  def aHash64(bytes: Array[Byte]): Long = {
    val img = readImage(resizeNearest(bytes, 8, 8))
    val vals = new Array[Int](64)
    var sum = 0L
    var p = 0
    while (p < 64) {
      val v = (img.getRGB(p % 8, p / 8) >>> 16) & 0xff
      vals(p) = v
      sum += v
      p += 1
    }
    val mean = sum / 64
    var hsh = 0L
    p = 0
    while (p < 64) {
      if (vals(p) > mean) hsh |= 1L << p
      p += 1
    }
    hsh
  }

  /** 64-bit difference-hash (dHash): decode → nearest-resize to 9×8
    * through the REAL codec round trip → bit y·8+x set iff
    * gray(x+1, y) > gray(x, y). Gradient-based, so a uniform brightness
    * shift doesn't flip bits the way [[aHash64]]'s global mean does;
    * every comparison is exact integer arithmetic over the decoded
    * raster, hence closed-form re-derivable for generated fixtures
    * (q287, the q97 contract).
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val img = readImage(resizeNearest(bytes, 9, 8))
    var hsh = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val l = (img.getRGB(x, y) >>> 16) & 0xff
        val r = (img.getRGB(x + 1, y) >>> 16) & 0xff
        if (r > l) hsh |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hsh
  }

  def resizeNearest(bytes: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
    val src = readImage(bytes)
    val sw = src.getWidth
    val sh = src.getHeight
    val dst = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dh) {
      val sy = y * sh / dh
      var x = 0
      while (x < dw) {
        dst.setRGB(x, y, src.getRGB(x * sw / dw, sy))
        x += 1
      }
      y += 1
    }
    writePng(dst)
  }
}
