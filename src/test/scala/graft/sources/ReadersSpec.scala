package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private val gen = "src/test/resources/fixture_generic"
  private val dev = "src/test/resources/fixture_devtest"

  test("tsv reads all-string schema-on-read") {
    val df = Readers.tsv(spark, s"$gen/my-metadata.tsv")
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 1)
    assert(df.head().getAs[String]("assay_type") == "codex")
    assert(Readers.tsvDelimiterViolations(df).isEmpty)
  }

  test("metadataTsv validates required columns and tissue/donor prefix") {
    val (df, violations) = Readers.metadataTsv(spark, s"$gen/my-metadata.tsv")
    assert(df.count() == 1)
    assert(violations.count() == 0)
  }

  test("metadataTsv flags missing required columns") {
    val (_, violations) = Readers.metadataTsv(spark, s"$gen/contributors.tsv")
    val rules = violations.select("rule").as[String].collect().toSeq
    assert(rules.count(_ == "required_column") == 3)
  }

  test("sniffSeparator detects commas and tabs") {
    assert(Readers.sniffSeparator(spark, s"$gen/raw/sample_001.csv") == ",")
    assert(Readers.sniffSeparator(spark, s"$gen/my-metadata.tsv") == "\t")
  }

  test("yaml reader parses devtest control file to JSON") {
    val df = Readers.yaml(spark, s"$dev/test.yml")
    val json = df.head().getAs[String]("json")
    val parsed = spark.range(1).select(
      from_json(lit(json), org.apache.spark.sql.types.DataType.fromDDL(
        "collectiontype STRING, delay_sec INT, files_to_copy ARRAY<STRING>, " +
        "metadata_to_return STRUCT<collectiontype: STRING, flag: BOOLEAN>")).as("j"))
      .select("j.*").head()
    assert(parsed.getAs[String]("collectiontype") == "devtest")
    assert(parsed.getAs[Int]("delay_sec") == 30)
    assert(parsed.getSeq[String](parsed.fieldIndex("files_to_copy")).toList == List("file_068.bov"))
    val meta = parsed.getStruct(parsed.fieldIndex("metadata_to_return"))
    assert(meta.getAs[Boolean]("flag"))
    assert(json.contains(""""b":[1,2,3]"""))
  }

  test("tformText parses typed value arrays and drops noise lines") {
    val df = Readers.tformText(spark, s"$dev/tform.txt")
    val m = df.as[(String, Seq[Double])].collect().toMap
    assert(m == Map("rotation" -> Seq(0.5, 1.5, 2.0), "translation" -> Seq(10.0, 20.0, 30.0)))
  }

  test("contributors is_contact filter matches reference truthy set") {
    val df = Readers.tsv(spark, s"$gen/contributors.tsv")
    val contacts = df.filter(upper(col("is_contact")).isin("TRUE", "T", "1", "Y", "YES"))
      .select("email").as[String].collect().toSeq
    assert(contacts == Seq("ada@example.org"))
  }
  test("frontmatter markdown splits metadata from content and validates vignette keys") {
    val doc = "---\nname: My Vignette\nfigures:\n  - file: f1.png\n    name: Fig 1\n---\nBody text here.\n"
    val (meta, content) = Readers.splitFrontmatter(doc)
    assert(meta.contains("name: My Vignette"))
    assert(content == "Body text here.")
    val (m2, c2) = Readers.splitFrontmatter("no frontmatter at all")
    assert(m2 == "" && c2 == "no frontmatter at all")

    val dir = java.nio.file.Files.createTempDirectory("vig").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "good.md").toPath, doc)
    java.nio.file.Files.writeString(new java.io.File(dir, "bad.md").toPath,
      "---\nfigures:\n  - file: f2.png\n---\nNo name.\n")
    val fm = Readers.frontmatterMd(spark, dir.getAbsolutePath)
    assert(fm.count() == 2)
    val violations = Readers.vignetteViolations(fm)
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1))).toSet
    assert(violations == Set(
      ("bad.md", "vignette markdown has no name"),
      ("bad.md", "figure dict does not provide a name")))
  }
  test("frontmatter accepts 4+-dash and trailing-whitespace close delimiters") {
    val (m1, c1) = Readers.splitFrontmatter("---\nname: A\n----\nbody")
    assert(m1 == "name: A\n" && c1 == "body")
    val (m2, c2) = Readers.splitFrontmatter("---\nname: B\n---  \nbody two")
    assert(m2 == "name: B\n" && c2 == "body two")
  }
  test("mtxTform parses 4x4 matrices and reports format violations") {
    val dir = java.nio.file.Files.createTempDirectory("mtx").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "good.txt").toPath,
      "1 0 0 5\n0 1 0 6\n0 0 1 7\n0 0 0 1\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "badword.txt").toPath,
      "1 0 0 0\n0 x 0 0\n0 0 1 0\n0 0 0 1\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "badrows.txt").toPath,
      "1 0 0 0\n0 1 0 0\n")
    val got = Readers.mtxTform(spark, dir.getAbsolutePath).collect()
      .map(r => (r.getString(0).split('/').last,
                 r.getSeq[scala.collection.Seq[Double]](1), Option(r.getString(2)))).toSeq
      .sortBy(_._1)
    val byName = got.map(g => g._1 -> g).toMap
    assert(byName("good.txt")._3.isEmpty)
    assert(byName("good.txt")._2.map(_.toList).toList ==
      List(List(1.0, 0, 0, 5), List(0.0, 1, 0, 6), List(0.0, 0, 1, 7), List(0.0, 0, 0, 1)))
    assert(byName("badword.txt")._3.get.startsWith("Unexpected format line"))
    assert(byName("badrows.txt")._3.get == "expected 4 rows, found 2")
  }
}