package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6/S9 (SURVEY.md §2.1; ome_tiff_metadata_file.py:12-16,
  * scn_tiff_metadata_file.py:11-17): TIFF/OME-TIFF header metadata
  * extraction on the JVM — a minimal real TIFF IFD walker over the
  * file's leading bytes (no image decode), covering what the reference
  * reads: dimensions, bits-per-sample, and the ImageDescription tag
  * where OME-XML / Leica SCN XML lives.
  *
  * Exposed as a UDF over `BinaryType` so extraction runs where the bytes
  * are (binaryFile source partitions), not on the driver. CZI/imzML
  * (S7/S8) follow the same binary-UDF pattern; their container parsing
  * is future work, with XML payload extraction shared via
  * [[xmlDescription]].
  */
object TiffMeta {

  /** `entryOffset` = byte offset of this IFD entry's value field, so
    * inline payloads (count×size ≤ 4) can be read in file byte order.
    */
  final case class Tag(id: Int, typ: Int, count: Long, valueOrOffset: Long,
                       entryOffset: Int)

  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8,
    6 -> 1, 7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8)

  /** Parse the first IFD of a TIFF byte array → tag map. Returns None if
    * the magic bytes don't match (not a TIFF).
    */
  def parseFirstIfd(bytes: Array[Byte]): Option[Map[Int, Tag]] = {
    if (bytes.length < 8) return None
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => return None
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    if (buf.getShort(2) != 42) return None
    val ifdOffset = buf.getInt(4).toLong & 0xffffffffL
    if (ifdOffset + 2 > bytes.length) return None
    val n = buf.getShort(ifdOffset.toInt) & 0xffff
    val tags = (0 until n).flatMap { i =>
      val base = ifdOffset.toInt + 2 + i * 12
      if (base + 12 > bytes.length) None
      else {
        val id = buf.getShort(base) & 0xffff
        val typ = buf.getShort(base + 2) & 0xffff
        val count = buf.getInt(base + 4).toLong & 0xffffffffL
        val v = buf.getInt(base + 8).toLong & 0xffffffffL
        // SHORT values are packed into the first 2 bytes of the value field
        val value = if (typ == 3 && count == 1) (buf.getShort(base + 8) & 0xffff).toLong else v
        Some(id -> Tag(id, typ, count, value, base + 8))
      }
    }.toMap
    Some(tags)
  }

  /** Read an ASCII tag's payload — inline (≤4 bytes live in the value
    * field itself, in file byte order) or via offset.
    */
  def asciiValue(bytes: Array[Byte], tag: Tag): Option[String] = {
    if (tag.typ != 2) return None
    val len = tag.count.toInt
    val start = if (len <= 4) tag.entryOffset else tag.valueOrOffset.toInt
    if (start < 0 || start + len > bytes.length) None
    else Some(new String(bytes, start, math.max(len - 1, 0), "US-ASCII")) // strip trailing NUL
  }

  /** Extract the metadata the reference consumes: width, height,
    * bits-per-sample, and the description (OME-XML) payload.
    */
  def extract(bytes: Array[Byte]): Option[(Long, Long, Long, String)] =
    parseFirstIfd(bytes).map { tags =>
      val w = tags.get(256).map(_.valueOrOffset).getOrElse(0L)
      val h = tags.get(257).map(_.valueOrOffset).getOrElse(0L)
      val bps = tags.get(258).map(_.valueOrOffset).getOrElse(0L)
      val desc = tags.get(270).flatMap(t => asciiValue(bytes, t)).getOrElse("")
      (w, h, bps, desc)
    }

  /** Pull the OME/SCN XML block out of a description payload. */
  def xmlDescription(desc: String): Option[String] = {
    val i = desc.indexOf("<?xml")
    val j = desc.indexOf('<')
    if (i >= 0) Some(desc.substring(i))
    else if (j >= 0) Some(desc.substring(j))
    else None
  }

  /** Column function: binary content → struct(width, height,
    * bits_per_sample, description). Null for non-TIFF bytes.
    */
  def tiffMeta(content: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None else extract(bytes)
    }
    f(content)
  }

  /** Catalog all TIFFs under a root: binaryFile scan filtered by
    * extension (pushed down to the listing), header-parsed per partition.
    */
  def scanTiffs(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.tif*")
      .load(root)
      .select(col("path"), col("length"), tiffMeta(col("content")).as("meta"))
      .select(col("path"), col("length"),
        col("meta._1").as("width"), col("meta._2").as("height"),
        col("meta._3").as("bits_per_sample"), col("meta._4").as("description"))
}
