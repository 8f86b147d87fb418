package graft.extract

import graft.SparkSpec
import graft.sources.FileCatalog

class CollectionDispatchSpec extends SparkSpec {
  import spark.implicits._

  test("generic metadata.tsv dir dispatches to generic_metadatatsv") {
    val listing = FileCatalog.scan(spark, "src/test/resources/fixture_generic")
    assert(CollectionDispatch.dispatch(listing) == "generic_metadatatsv")
  }

  test("devtest dir dispatches to devtest") {
    val listing = FileCatalog.scan(spark, "src/test/resources/fixture_devtest")
    assert(CollectionDispatch.dispatch(listing) == "devtest")
  }

  test("two -metadata.tsv files dispatch to multiassay (priority beats generic)") {
    val listing = Seq("rna-metadata.tsv", "atac-metadata.tsv", "data/x.bin").toDF("rel_path")
    assert(CollectionDispatch.dispatch(listing) == "multiassay_metadatatsv")
  }

  test("empty listing dispatches to unrecognized (no NPE)") {
    val empty = Seq.empty[String].toDF("rel_path")
    assert(CollectionDispatch.dispatch(empty) == "unrecognized")
  }

  test("dispatchAll routes many datasets in one pass") {
    val listing = Seq(
      ("d1", "my-metadata.tsv"),
      ("d2", "rna-metadata.tsv"), ("d2", "atac-metadata.tsv"),
      ("d3", "nothing.bin"),
      ("d4", "x-metadata.tsv"), ("d4", "src_raw/experiment.json"),
    ).toDF("dataset_id", "rel_path")
    val got = CollectionDispatch.dispatchAll(listing)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "d1" -> "generic_metadatatsv",
      "d2" -> "multiassay_metadatatsv",
      "d3" -> "unrecognized",
      "d4" -> "generic_metadatatsv")) // single metadata.tsv beats akoya priority
  }
}
