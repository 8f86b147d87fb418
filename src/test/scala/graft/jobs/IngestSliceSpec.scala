package graft.jobs

import graft.SparkSpec

class IngestSliceSpec extends SparkSpec {

  test("end-to-end generic ingest: scan → dispatch → validate → envelope → route → status") {
    val r = IngestSlice.run(spark, "src/test/resources/fixture_generic", "ds-0001")
    assert(r.collectionType == "generic_metadatatsv")
    assert(r.workflow == "codex_cytokit")
    assert(r.violations.isEmpty)
    assert(r.statusEvent == (("ds-0001", "dataset", "valid")))
    assert(r.envelopeJson.contains(""""assay_type":"codex""""))
    assert(r.envelopeJson.contains(""""ada@example.org""""))     // promoted contact
    assert(r.envelopeJson.contains(""""raw reads""""))           // manifest annotation
    assert(r.envelopeJson.contains(""""dag_provenance_list""""))
  }

  test("devtest dir routes to no_workflow but still dispatches") {
    val r = IngestSlice.run(spark, "src/test/resources/fixture_devtest", "ds-0002")
    assert(r.collectionType == "devtest")
    assert(r.workflow == "no_workflow")
    assert(r.statusEvent._3 == "invalid") // no metadata.tsv → violations
  }
}
