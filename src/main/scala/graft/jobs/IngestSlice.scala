package graft.jobs

import graft.extract.{CollectionDispatch, Envelope}
import graft.operators.Routing
import graft.sources.{FileCatalog, Readers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The minimum end-to-end slice (SURVEY.md §7 / §3.1): request_ingest of
  * a generic metadata.tsv dataset — scan (S1) → dispatch (S14) → parse +
  * validate (S2/S4/V2) → envelope (+schema check) → route (J5) → status
  * event. One Spark job; each stage hands the next a DataFrame, with
  * Catalyst seeing the whole lineage (vs the reference's per-stage
  * YAML/XCom handoffs).
  */
object IngestSlice {

  final case class IngestResult(
      datasetId: String,
      collectionType: String,
      workflow: String,
      violations: Seq[String],
      envelopeJson: String,
      statusEvent: (String, String, String))

  /** Workflow routing rules keyed on assay_type (workflow_map.yml shape). */
  val workflowRules: Seq[Routing.RoutingRule] = Seq(
    Routing.RoutingRule("(?i)codex", "codex_cytokit", 1),
    Routing.RoutingRule("(?i)rnaseq|scrna", "salmon_rnaseq", 2),
    Routing.RoutingRule("(?i)atac", "sc_atac_seq", 3),
  )

  /** Melt a one-row schema-on-read table to (key, value) metadata rows. */
  def meltRow(df: DataFrame, datasetId: String): DataFrame = {
    val kvs = df.columns.map(c => struct(lit(c).as("key"), col(c).as("value")))
    df.select(explode(array(kvs.toIndexedSeq: _*)).as("kv"))
      .select(lit(datasetId).as("dataset_id"), col("kv.key"), col("kv.value"))
  }

  def run(spark: SparkSession, dir: String, datasetId: String): IngestResult = {
    // S1: distributed scan + tagging
    val listing = FileCatalog.scan(spark, dir).withColumn("dataset_id", lit(datasetId))
    // S14: priority dispatch
    val collectionType = CollectionDispatch.dispatch(listing)
    // S2/S4 + V2: metadata parse + structural validation
    val metadataPath = listing.filter(col("rel_path").rlike("(?i)^[^/]*metadata\\.tsv$"))
      .select("rel_path").collect().headOption.map(r => s"$dir/${r.getString(0)}")
    val (md, violations) = metadataPath match {
      case Some(p) => Readers.metadataTsv(spark, p)
      case None => (spark.emptyDataFrame, spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq())))
    }
    val violationList =
      if (metadataPath.isEmpty) Seq("required_file: metadata.tsv missing")
      else violations.collect().map(r => s"${r.getString(0)}: ${r.getString(1)}").toSeq
    // contributors sub-TSV (F1 contract); guard: header-only metadata.tsv
    // has the column but no rows — report violations, don't throw
    val contributors = metadataPath.flatMap { _ =>
      val firstRow = if (md.columns.contains("contributors_path")) md.take(1).headOption else None
      val cPath = firstRow.flatMap(r => Option(r.getAs[String]("contributors_path")))
      cPath.map(p => Readers.tsv(spark, s"$dir/${p.stripPrefix("./")}")
        .withColumn("dataset_id", lit(datasetId)))
    }.getOrElse(spark.range(0).select(
      lit(datasetId).as("dataset_id"), lit("").as("name"), lit("").as("affiliation"),
      lit("").as("orcid_id"), lit("").as("is_contact"), lit("").as("email")))
    // envelope assembly + validation
    val annotated = FileCatalog.annotate(listing, Seq(
      FileCatalog.ManifestRule("(?i)\\.fastq$", "raw reads", "EDAM:format_1930", isDataProduct = true),
      FileCatalog.ManifestRule("(?i)metadata\\.tsv$", "assay metadata", "EDAM:format_3475")))
    val metadata = if (md.columns.nonEmpty) meltRow(md, datasetId)
      else spark.range(0).select(lit(datasetId).as("dataset_id"), lit("").as("key"), lit("").as("value"))
    val envelope = Envelope.assemble(metadata, annotated, contributors,
      Seq(("graft-ingest", BuildInfo.commit, "graft", BuildInfo.version)))
    val envViolations = Envelope.validate(envelope).collect().map(_.getString(1)).toSeq
    // J5 routing on assay_type
    val assay = if (md.columns.contains("assay_type") && md.count() > 0)
      md.head().getAs[String]("assay_type") else ""
    val workflow = workflowRules.sortBy(_.priority)
      .find(r => java.util.regex.Pattern.compile(r.pattern).matcher(assay).find())
      .map(_.workflow).getOrElse("no_workflow")
    // status event from validation outcome
    val status = if (violationList.isEmpty && envViolations.isEmpty) "valid" else "invalid"
    IngestResult(
      datasetId, collectionType, workflow,
      violationList ++ envViolations,
      Envelope.toJsonDoc(envelope).head().getAs[String]("doc"),
      (datasetId, "dataset", status))
  }

  /** Minimal build provenance (the reference shells out to git —
    * utils.py:626-663; we inline constants wired at release time).
    */
  object BuildInfo {
    val commit: String = "dev"
    val version: String = "0.1.0"
  }
}
