package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7/S8 (SURVEY.md §2.1; czi_metadata_file.py:12-17,
  * imzml_metadata_file.py:11-18): CZI and imzML header-metadata
  * extraction — the reference pulls a metadata dict out of each
  * container's XML block; we extract the XML from the raw bytes and
  * parse the key/value surface it actually uses.
  *
  * CZI (ZISRAW): the metadata lives in a `ZISRAWMETADATA` segment — a
  * 32-byte id + 288-byte segment header followed by the XML payload; we
  * locate the segment id and slice the XML document that follows.
  * imzML: plain XML — `cvParam` accession/name/value triples.
  * Both run as binary-column functions next to the bytes (binaryFile
  * partitions), never on the driver.
  */
object SciBinaryMeta {

  /** Walk the ZISRAW segment chain: each segment is a 32-byte header
    * (16-byte ASCII id, int64 allocated size, int64 used size) followed
    * by `allocated` payload bytes. The ZISRAWMETADATA payload leads with
    * int32 xmlSize + int32 attachmentSize + 248 spare bytes, then the
    * XML document. Falls back to a marker scan for truncated/nonstandard
    * streams (we often only have the leading bytes of a huge file).
    */
  def cziXml(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 32 ||
        !new String(bytes, 0, 10, StandardCharsets.US_ASCII).startsWith("ZISRAWFILE"))
      return cziXmlByMarker(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 0L
    var guard = 0
    while (off + 32 <= bytes.length && guard < 10000) {
      val id = new String(bytes, off.toInt, 16, StandardCharsets.US_ASCII)
        .takeWhile(c => c != '\u0000' && c != ' ')
      val alloc = buf.getLong(off.toInt + 16)
      if (id == "ZISRAWMETADATA") {
        val payload = off.toInt + 32
        if (payload + 8 > bytes.length) return cziXmlByMarker(bytes)
        val xmlSize = buf.getInt(payload)
        val xmlStart = payload + 256
        if (xmlSize <= 0 || xmlStart >= bytes.length) return cziXmlByMarker(bytes)
        val len = math.min(xmlSize, bytes.length - xmlStart)
        return Some(new String(bytes, xmlStart, len, StandardCharsets.UTF_8).trim)
      }
      if (alloc <= 0) return cziXmlByMarker(bytes)
      off += 32 + alloc
      guard += 1
    }
    cziXmlByMarker(bytes)
  }

  /** Full ZISRAW segment inventory — one row per segment in chain order:
    * (segment_id, offset, allocated, used). The catalog view of a CZI
    * container (subblock/attachment/directory counts fall out of a
    * groupBy on segment_id); stops cleanly at truncation, which is the
    * normal case when only a file's leading bytes were fetched.
    */
  def cziSegments(bytes: Array[Byte]): Seq[(String, Long, Long, Long)] = {
    if (bytes.length < 32 ||
        !new String(bytes, 0, 10, StandardCharsets.US_ASCII).startsWith("ZISRAWFILE"))
      return Seq.empty
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    var off = 0L
    var guard = 0
    var ok = true
    while (ok && off + 32 <= bytes.length && guard < 10000) {
      val id = new String(bytes, off.toInt, 16, StandardCharsets.US_ASCII)
        .takeWhile(c => c != '\u0000' && c != ' ')
      val alloc = buf.getLong(off.toInt + 16)
      val used = buf.getLong(off.toInt + 24)
      if (id.isEmpty || alloc < 0) ok = false
      else {
        out += ((id, off, alloc, used))
        if (alloc == 0) ok = false else off += 32 + alloc
      }
      guard += 1
    }
    out.toSeq
  }

  /** Distributed CZI segment catalog over a directory of .czi files. */
  def scanCziSegments(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.czi")
      .load(root)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        cziSegments(bytes).map { case (id, off, alloc, used) => (p, id, off, alloc, used) }
      }
      .toDF("path", "segment_id", "offset", "allocated", "used")
  }

  /** Fallback: locate the metadata segment id anywhere and slice the XML
    * document that follows it.
    */
  private def cziXmlByMarker(bytes: Array[Byte]): Option[String] = {
    val marker = "ZISRAWMETADATA".getBytes(StandardCharsets.US_ASCII)
    val at = indexOfBytes(bytes, marker, 0)
    if (at < 0) return None
    val s = new String(bytes, at, bytes.length - at, StandardCharsets.UTF_8)
    val xmlStart = {
      val decl = s.indexOf("<?xml")
      if (decl >= 0) decl else s.indexOf('<', marker.length)
    }
    if (xmlStart < 0) None
    else {
      val xml = s.substring(xmlStart)
      val end = xml.lastIndexOf('>')
      if (end < 0) None else Some(xml.substring(0, end + 1))
    }
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val CvParamRe =
    """<cvParam[^>]*?accession="([^"]*)"[^>]*?name="([^"]*)"(?:[^>]*?value="([^"]*)")?[^>]*/?>""".r

  /** imzML/mzML cvParam triples: (accession, name, value). */
  def cvParams(xml: String): Seq[(String, String, String)] =
    CvParamRe.findAllMatchIn(xml).map { m =>
      (m.group(1), m.group(2), Option(m.group(3)).getOrElse(""))
    }.toSeq

  /** Simple tag-attribute extraction for CZI metadata XML: returns text
    * of `<name>value</name>` leaf elements (the reference flattens the
    * xmltodict output the same way).
    */
  def leafValues(xml: String, names: Seq[String]): Map[String, String] =
    names.flatMap { n =>
      val re = s"(?s)<$n[^>]*>([^<]*)</$n>".r
      re.findFirstMatchIn(xml).map(m => n -> m.group(1).trim)
    }.toMap

  /** Column function: CZI bytes → metadata XML string (null if absent). */
  def cziXmlCol(content: Column): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) None else cziXml(b))
    f(content)
  }

  /** Distributed imzML catalog: one row per (file, cvParam). */
  def scanImzml(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.imzML")
      .load(root)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        cvParams(new String(bytes, StandardCharsets.UTF_8))
          .map { case (acc, name, v) => (p, acc, name, v) }
      }
      .toDF("path", "accession", "name", "value")
  }
}
