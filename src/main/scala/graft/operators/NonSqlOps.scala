package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.SimHash64.simhash64
import graft.functions.WinnowFingerprints.winnowFingerprints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operators whose semantics aren't expressible in DuckDB SQL (custom
  * hash kernels, stubbed codecs): declared WITHOUT oracle entries, so
  * the driver records its weaker rows-only check — correctness for
  * these is covered by the spec layer (SimHashSpec, WinnowSpec,
  * MultimodalSpec) instead.
  */
object NonSqlOps extends QueryModule {

  /** SimHash near-dup signatures + hamming-bucket summary. */
  def simhashBuckets(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), simhash64(split(lower(col("text")), " ")).as("sig"))
      .withColumn("bucket", shiftrightunsigned(col("sig"), 48)) // 16-bit prefix block
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("sig")).as("n_distinct_sigs"))
      .orderBy("bucket")

  /** Winnowing fingerprint stats per document. */
  def winnowStats(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        size(winnowFingerprints(lower(col("text")))).cast("long").as("n_fingerprints"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Multimodal metadata over the documents' bytes through the real
    * decode plumbing (stub codec — deterministic).
    */
  def mediaMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media = documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => Multimodal.MediaRow(id, "image", text.getBytes("UTF-8")) }
    Multimodal.decodeMeta(media).toDF()
      .select("media_id", "n_bytes", "width", "height", "format")
      .orderBy("media_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_simhash_buckets" -> ((s, d) => simhashBuckets(Tables(s, d).documents)),
    "q53_winnow_stats"    -> ((s, d) => winnowStats(Tables(s, d).documents)),
    "q54_media_meta"      -> ((s, d) => mediaMeta(Tables(s, d).documents)),
  )

  /** Intentionally empty: no SQL-expressible oracle (rows-only checks). */
  override def oracles: Map[String, String] = Map.empty
}
