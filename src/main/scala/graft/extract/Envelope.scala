package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset metadata envelope assembly (SURVEY.md §1.1;
  * dataset_metadata_schema.yml:11-21, assembled at utils.py:1586-1721):
  * one nested document per dataset — string-map metadata, file records,
  * provenance list, contacts promoted from contributors
  * (utils.py:1541-1549,1658-1662 truthy is_contact set).
  *
  * Everything is built with collect_list(struct(...)) aggregations keyed
  * by dataset, so envelope assembly for N datasets is one shuffle, not
  * N driver round trips.
  */
object Envelope {

  /** The reference's truthy set for is_contact. */
  val TruthySet: Seq[String] = Seq("TRUE", "T", "1", "Y", "YES")

  def isTruthy(c: Column): Column = upper(trim(c)).isin(TruthySet: _*)

  /** Promote contacts from a contributors table (per-dataset). */
  def contacts(contributors: DataFrame): DataFrame =
    contributors.filter(isTruthy(col("is_contact")))
      .select("dataset_id", "name", "email", "affiliation")

  /** Assemble one envelope row per dataset:
    * {dataset_id, metadata: map<string,string>, files: array<struct>,
    *  contributors: array<struct>, contacts: array<struct>,
    *  dag_provenance_list: array<struct>}.
    *
    * `metadata` rows are (dataset_id, key, value) — schema-on-read
    * strings per §1.2. `listing` is the annotated file catalog with a
    * dataset_id column.
    */
  def assemble(metadata: DataFrame, listing: DataFrame,
               contributors: DataFrame,
               provenance: Seq[(String, String, String, String)]): DataFrame = {
    val provLit = array(provenance.map { case (n, h, o, v) =>
      struct(lit(n).as("name"), lit(h).as("hash"), lit(o).as("origin"), lit(v).as("version"))
    }: _*)
    val md = metadata.groupBy("dataset_id")
      .agg(map_from_entries(collect_list(struct(col("key"), col("value")))).as("metadata"))
    val files = listing.groupBy("dataset_id")
      .agg(sort_array(collect_list(struct(
        col("rel_path"), col("type"), col("size"),
        col("description"), col("edam_term"),
        col("is_qa_qc"), col("is_data_product")))).as("files"))
    val contribs = contributors.groupBy("dataset_id")
      .agg(sort_array(collect_list(struct(
        col("name"), col("affiliation"), col("orcid_id"),
        col("is_contact"), col("email")))).as("contributors"))
    val cts = contacts(contributors).groupBy("dataset_id")
      .agg(sort_array(collect_list(struct(col("name"), col("email"), col("affiliation")))).as("contacts"))
    md.join(files, Seq("dataset_id"), "full")
      .join(contribs, Seq("dataset_id"), "left")
      .join(cts, Seq("dataset_id"), "left")
      // NullType-coercing coalesce: a dataset with no rows on a side gets
      // an EMPTY array/map, not null — the envelope schema is total
      .withColumn("files", expr("coalesce(files, array())"))
      .withColumn("metadata", expr("coalesce(metadata, map())"))
      .withColumn("contacts", expr("coalesce(contacts, array())"))
      .withColumn("contributors", expr("coalesce(contributors, array())"))
      .withColumn("dag_provenance_list", provLit)
  }

  /** Envelope → canonical JSON document column (K3). */
  def toJsonDoc(envelope: DataFrame): DataFrame =
    envelope.select(col("dataset_id"),
      to_json(struct(envelope.columns.filter(_ != "dataset_id").toIndexedSeq.map(col): _*)).as("doc"))

  /** V1-style envelope checks: required members present and well-formed;
    * returns violations (empty = valid).
    */
  def validate(envelope: DataFrame): DataFrame = {
    envelope.select(col("dataset_id"),
        when(col("dag_provenance_list").isNull || size(col("dag_provenance_list")) === 0,
          lit("missing dag_provenance_list")).as("v1"),
        when(col("files").isNull, lit("missing files")).as("v2"),
        when(col("metadata").isNull, lit("missing metadata")).as("v3"))
      .select(col("dataset_id"), explode(array_compact(array(col("v1"), col("v2"), col("v3")))).as("violation"))
  }
}
