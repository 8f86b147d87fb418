package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (training-data-pipeline mandate): media
  * payloads are opaque `binary` columns with typed metadata columns
  * alongside. The Spark-side plumbing — schema, partition-parallel batch
  * decode via `mapPartitions`, metadata projection — is real; the codec
  * itself is STUBBED (no image/audio libraries in this container) with a
  * deterministic fake decoder, clearly marked below, so the pipeline
  * shape is testable end-to-end and a real codec drops in behind the
  * same trait.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int, n_frames: Int, format: String)

  /** Codec boundary: a real implementation wraps an image/audio library;
    * partition-level batching amortizes codec init (the Pandas-UDF batch
    * pattern, in Scala).
    */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, String)
  }

  /** STUB DECODER — deterministic fake: derives "dimensions" from the
    * payload bytes (length + first-bytes hash) instead of decoding. The
    * container has no media codecs; replace with a real decoder behind
    * the same trait. Everything around it (schema, batching,
    * partitioning) is production-shaped.
    */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, String) = {
      val h = bytes.take(16).foldLeft(17)((a, b) => a * 31 + b)
      val w = 64 + math.abs(h % 512)
      val ht = 64 + math.abs((h / 512) % 512)
      val frames = kind match {
        case "video" => 1 + math.abs(h % 300)
        case "audio" => 1 + math.abs(h % 48000)
        case _ => 1
      }
      (w, ht, frames, s"stub/$kind")
    }
  }

  /** Decode media metadata partition-parallel. The decoder is created
    * once per partition (codec init amortization) and rows stream
    * through it — the `mapInPandas` batch shape, JVM-native.
    */
  def decodeMeta(media: Dataset[MediaRow], decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val (w, h, frames, fmt) = decoder.decode(row.kind, row.bytes)
        MediaMeta(row.media_id, row.kind, row.bytes.length.toLong, w, h, frames, fmt)
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
    * geometry). STUB: emits a deterministic payload derived from the
    * input (first bytes + geometry tag) — a real implementation wraps an
    * image library behind the same trait.
    */
  trait MediaTransformer extends Serializable {
    def resize(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  object StubTransformer extends MediaTransformer {
    def resize(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      s"stub-resize/$kind/${w}x$h/".getBytes("UTF-8") ++ bytes.take(32)
  }

  /** Resize every payload to a target geometry, partition-parallel —
    * same batch shape as [[decodeMeta]]: transformer built once per
    * partition, rows stream through, output stays a binary column.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int,
                transformer: MediaTransformer = StubTransformer): Dataset[MediaResized] = {
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

  /** STUB: deterministic byte-hash expansion in [-0.5, 0.5). */
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
