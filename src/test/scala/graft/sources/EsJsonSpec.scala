package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EsJsonSpec extends SparkSpec {

  private lazy val flat = EsJson.flattenHits(
    EsJson.readResponse(spark, "src/test/resources/es_response.json"),
    Seq("entity_type", "group_name", "status", "created_by_user_display_name",
      "created_timestamp", "title"))

  test("flattenHits explodes hits.hits with _id → uuid and the _source keep-list") {
    val rows = flat.orderBy("uuid").collect()
    assert(rows.length == 3)
    assert(flat.columns.toSeq == Seq("uuid", "entity_type", "group_name", "status",
      "created_by_user_display_name", "created_timestamp", "title"))
    val first = rows.head
    assert(first.getAs[String]("uuid") == "uuid-0001")
    assert(first.getAs[String]("group_name") == "Group A")
    assert(first.getAs[String]("created_by_user_display_name") == "Ada Example")
    // fields outside the keep-list are dropped entirely
    assert(!flat.columns.contains("extra_field_not_in_keep_list"))
    // a hit missing a requested field surfaces as null (json_normalize behavior)
    val third = rows.last
    assert(third.getAs[String]("uuid") == "uuid-0003")
    assert(third.getAs[String]("title") == null)
  }

  test("ingest_url concatenates only when both parts exist; created_date from epoch millis") {
    val derived = flat
      .withColumn("ingest_url",
        EsJson.ingestUrl("https://ingest.example.org", col("entity_type"), col("uuid")))
      .withColumn("created_date", EsJson.dateFromMillis(col("created_timestamp")))
      .orderBy("uuid").collect()
    assert(derived.head.getAs[String]("ingest_url") == "https://ingest.example.org/dataset/uuid-0001")
    assert(derived.head.getAs[String]("created_date") == "2023-11-14")
    // null entity_type → empty url, the reference's fallback
    val nulled = flat.withColumn("entity_type", lit(null).cast("string"))
      .withColumn("ingest_url",
        EsJson.ingestUrl("https://ingest.example.org", col("entity_type"), col("uuid")))
      .collect()
    assert(nulled.forall(_.getAs[String]("ingest_url") == ""))
  }

  test("zero-hit pages and fully-absent keep-list fields degrade to nulls, not errors") {
    import spark.implicits._
    // a normal empty ES result: hits.hits is [] and inference can't type it
    val empty = spark.read.json(Seq(
      """{"took":1,"timed_out":false,"hits":{"total":{"value":0,"relation":"eq"},"hits":[]}}""").toDS())
    val flatEmpty = EsJson.flattenHits(empty, Seq("status", "title"))
    assert(flatEmpty.columns.toSeq == Seq("uuid", "status", "title"))
    assert(flatEmpty.count() == 0)
    // a keep-list field carried by NO hit on the page → null column
    val sparse = spark.read.json(Seq(
      """{"hits":{"hits":[{"_id":"a","_source":{"status":"New"}}]}}""").toDS())
    val flatSparse = EsJson.flattenHits(sparse, Seq("status", "not_present_anywhere"))
    val row = flatSparse.collect().head
    assert(row.getAs[String]("status") == "New")
    assert(row.getAs[String]("not_present_anywhere") == null)
  }

  test("groupViolations flags hits from the wrong group") {
    val bad = EsJson.groupViolations(flat, "group_name", "Group A").collect()
    assert(bad.map(_.getAs[String]("uuid")).toSeq == Seq("uuid-0003"))
    assert(EsJson.groupViolations(flat.filter(col("group_name") === "Group A"),
      "group_name", "Group A").count() == 0)
  }
}
