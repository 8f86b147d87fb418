package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val root = "src/test/resources/fixture_generic"

  test("scan lists all files with relative paths, sizes and type tags") {
    val got = FileCatalog.scan(spark, root)
    val byPath = got.collect().map(r => r.getAs[String]("rel_path") -> r.getAs[String]("type")).toMap
    assert(byPath == Map(
      "my-metadata.tsv" -> "tsv",
      "contributors.tsv" -> "tsv",
      "antibodies.tsv" -> "tsv",
      "extras/thumbnail.jpg" -> "unknown",
      "raw/sample_001.fastq" -> "fastq",
      "raw/sample_001.csv" -> "csv"))
    assert(got.filter(col("size") <= 0).count() == 0)
  }

  test("annotate applies first-match rule with template expansion") {
    val listing = FileCatalog.scan(spark, root)
    val rules = Seq(
      FileCatalog.ManifestRule("raw/sample_(\\d+)\\.csv$", "sample {g1} table", "EDAM:0001", isDataProduct = true),
      FileCatalog.ManifestRule("\\.tsv$", "tabular metadata", "EDAM:0002"),
    )
    val got = FileCatalog.annotate(listing, rules)
    val m = got.collect().map(r => r.getAs[String]("rel_path") -> r.getAs[String]("description")).toMap
    assert(m("raw/sample_001.csv") == "sample 001 table")
    assert(m("my-metadata.tsv") == "tabular metadata")
    assert(m("extras/thumbnail.jpg") == "")
    val dp = got.filter(col("is_data_product")).select("rel_path").as[String].collect().toSeq
    assert(dp == Seq("raw/sample_001.csv"))
  }

  test("stats aggregates per type") {
    val got = FileCatalog.stats(FileCatalog.scan(spark, root))
      .select("type", "n_files").as[(String, Long)].collect().toMap
    assert(got("tsv") == 3L)
  }

  test("extensionRenamePlan proposes only changed names") {
    val listing = Seq("a.tif", "b.tiff", "c.yml").toDF("rel_path")
    val got = FileCatalog.extensionRenamePlan(listing)
      .as[(String, String)].collect().toMap
    assert(got == Map("a.tif" -> "a.tiff", "c.yml" -> "c.yaml"))
  }
}
