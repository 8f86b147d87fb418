package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Elasticsearch search-response reader (SURVEY §2.1 S15).
  *
  * The reference's reporting DAGs start from a search-API response and
  * normalize it to a flat table
  * (email_providers.py:205-234 `json_normalize(record_path=["hits","hits"])`,
  * then :291-320 rename `_id` → `uuid`, strip the `_source.` prefix for a
  * field keep-list, derive `ingest_url`/`created_date`). Spark-first, the
  * same surface is one `spark.read.json` + a generator explode of
  * `hits.hits` + a column keep-list — the explode runs distributed, so a
  * scrolled multi-page response (one JSON doc per line/file) fans out
  * across the cluster instead of through a driver-side DataFrame.
  */
object EsJson {

  /** Read one-or-many ES response documents. Each input file is a whole
    * JSON document (`multiLine`), the shape the search API returns;
    * globs/directories give one row per page, which [[flattenHits]] then
    * explodes — pages stay distributed.
    */
  def readResponse(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** `hits.hits` → flat table: `_id` becomes `uuid`, each requested
    * `_source` field comes out under its bare name (the reference's
    * rename keep-list). Fields absent from EVERY hit surface as null
    * string columns (like `json_normalize` over sparse records), and a
    * zero-hit page — where JSON inference can't even type the empty
    * array — yields an empty frame with the uuid + keep-list schema
    * instead of failing analysis.
    */
  def flattenHits(response: DataFrame, sourceFields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
    val spark = response.sparkSession
    val hitsType = response.schema.fields.find(_.name == "hits")
      .map(_.dataType).collect { case s: StructType => s }
      .flatMap(_.fields.find(_.name == "hits")).map(_.dataType)
    hitsType match {
      case Some(ArrayType(hitStruct: StructType, _)) =>
        val hit = response.select(explode(col("hits.hits")).as("hit"))
        val sourceStruct = hitStruct.fields.find(_.name == "_source")
          .map(_.dataType).collect { case s: StructType => s }
        val keep = col("hit._id").as("uuid") +: sourceFields.map { f =>
          if (sourceStruct.exists(_.fieldNames.contains(f)))
            col("hit._source").getField(f).as(f)
          else lit(null).cast(StringType).as(f) // absent from every hit on this page
        }
        hit.select(keep: _*)
      case _ =>
        // empty page: hits.hits inferred as array<string> (or missing)
        val schema = StructType(
          org.apache.spark.sql.types.StructField("uuid", StringType) +:
            sourceFields.map(f => org.apache.spark.sql.types.StructField(f, StringType)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** `ingest_url` derivation (email_providers.py:334-338): entity page
    * URL when both parts exist, else empty string. The base URL is
    * injected — deployment config, not engine logic.
    */
  def ingestUrl(baseUrl: String, entityType: Column, uuid: Column): Column =
    when(entityType.isNotNull && uuid.isNotNull,
      concat_ws("/", lit(baseUrl), entityType, uuid))
      .otherwise(lit(""))

  /** `created_date`-style derivation (email_providers.py:329-331): epoch
    * millis → `yyyy-MM-dd`.
    */
  def dateFromMillis(millis: Column): Column =
    date_format(timestamp_millis(millis), "yyyy-MM-dd")

  /** The reference's post-read sanity check (email_providers.py:275-284
    * verify_search_results): every hit must carry the expected group
    * name. Returns the violating rows instead of throwing — the
    * violations-DataFrame convention used across §2.8.
    */
  def groupViolations(flat: DataFrame, groupField: String, expected: String): DataFrame =
    flat.filter(col(groupField).isNull || col(groupField) =!= expected)
}
