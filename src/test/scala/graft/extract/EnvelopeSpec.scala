package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def fixtures = {
    val metadata = Seq(
      ("d1", "assay_type", "codex"), ("d1", "data_path", "./raw"),
      ("d2", "assay_type", "rnaseq")).toDF("dataset_id", "key", "value")
    val listing = Seq(
      ("d1", "raw/a.csv", "csv", 10L, "sample table", "EDAM:1", false, true),
      ("d1", "my-metadata.tsv", "tsv", 5L, "", "", false, false))
      .toDF("dataset_id", "rel_path", "type", "size", "description", "edam_term", "is_qa_qc", "is_data_product")
    val contributors = Seq(
      ("d1", "Ada", "Uni", "0000-1", "TRUE", "ada@x.org"),
      ("d1", "Bob", "Lab", "0000-2", "no", "bob@x.org"))
      .toDF("dataset_id", "name", "affiliation", "orcid_id", "is_contact", "email")
    (metadata, listing, contributors)
  }

  test("assemble builds one nested envelope per dataset with promoted contacts") {
    val (md, listing, contribs) = fixtures
    val env = Envelope.assemble(md, listing, contribs, Seq(("graft", "abc123", "origin", "0.1")))
    val rows = env.orderBy("dataset_id").collect()
    assert(rows.length == 2)
    val d1 = rows(0)
    assert(d1.getAs[Map[String, String]]("metadata") == Map("assay_type" -> "codex", "data_path" -> "./raw"))
    assert(d1.getSeq[org.apache.spark.sql.Row](d1.fieldIndex("files")).length == 2)
    val contacts = d1.getSeq[org.apache.spark.sql.Row](d1.fieldIndex("contacts"))
    assert(contacts.map(_.getAs[String]("email")) == Seq("ada@x.org"))
    assert(Envelope.validate(env).count() == 0)
  }

  test("validate reports missing provenance") {
    val (md, listing, contribs) = fixtures
    val env = Envelope.assemble(md, listing, contribs, Seq.empty)
    val v = Envelope.validate(env).select("violation").as[String].collect().toSet
    assert(v == Set("missing dag_provenance_list"))
  }

  test("toJsonDoc emits parseable canonical JSON") {
    val (md, listing, contribs) = fixtures
    val env = Envelope.assemble(md, listing, contribs, Seq(("graft", "abc", "o", "1")))
    val doc = Envelope.toJsonDoc(env).filter(col("dataset_id") === "d1").head().getAs[String]("doc")
    assert(doc.contains(""""contacts":[{"name":"Ada""""))
    assert(doc.contains(""""dag_provenance_list":[{"name":"graft""""))
  }
}
