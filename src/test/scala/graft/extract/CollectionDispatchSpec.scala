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
  test("the full reference ladder: epic, generic shadowing, stanford, ims") {
    def d(paths: String*) = CollectionDispatch.dispatch(paths.toSeq.toDF("rel_path"))
    // epic: metadata.tsv + derived/<dir>/ files beats generic (2.1 > 2.0)
    assert(d("sample-metadata.tsv", "derived/imgset1/a.ome.tiff") == "epic_metadata")
    // faithful shadowing: ONE metadata.tsv -> generic (2.0) wins even
    // over a dir that also looks stanford/rnaseq-shaped (1.0) — same
    // first-match outcome as the reference's ladder
    assert(d("x-metadata.tsv", "raw/processingOptions.json", "raw/Experiment.json",
             "raw/channelNames.txt") == "generic_metadatatsv")
    // generic REJECTS two metadata.tsv ("Too many matches!"); with only
    // one of them dashed, multiassay (needs 2 dashed) also passes, so
    // the stanford instrument files finally win
    assert(d("x-metadata.tsv", "extrametadata.tsv", "raw/processingOptions.json",
             "raw/Experiment.json", "raw/channelNames.txt") == "stanford_codex")
    // ims has NO metadata.tsv at all -> nothing shadows it
    assert(d("s-spatial_meta.txt", "raw_microscopy/s-AF_raw.czi",
             "raw_microscopy/s-PAS_raw.scn", "IMS/s-instrument_metadata.yml") == "ims")
    // a directory containing ONLY a dashed metadata.tsv: generic and
    // metadatatsv both match; generic wins on priority
    assert(d("only-metadata.tsv") == "generic_metadatatsv")
  }
}