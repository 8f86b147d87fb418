package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReorganizeSpec extends SparkSpec {
  import spark.implicits._

  private def metadata = Seq(
    ("10x Multiome!", "./dataset1", "./contributors.tsv", null.asInstanceOf[String]),
    ("RNAseq", "./dataset2", "./contributors.tsv", "L-42"),
  ).toDF("assay_type", "data_path", "contributors_path", "lab_id")

  test("phase1 freezes augmented metadata; phase2 resumes from the barrier") {
    val freeze = java.nio.file.Files.createTempDirectory("frozen").toString + "/frozen"
    val aug = Reorganize.phase1(metadata, "up1", freeze)
    assert(aug.select("canonical_assay_type").as[String].collect().toSet ==
      Set("10x_multiome_", "rnaseq"))
    // deterministic child ids on re-run (idempotent resume)
    val again = Reorganize.phase1(metadata, "up1", freeze)
    assert(aug.select("child_id").as[String].collect().toSet ==
      again.select("child_id").as[String].collect().toSet)
    val frozen = Reorganize.readFrozen(spark, freeze)
    assert(frozen.count() == 2)
    assert(frozen.select("lab_id").as[String].collect().contains("L-42"))

    val childMd = Reorganize.childMetadata(frozen)
    assert(childMd.select("data_path").as[String].collect().forall(_ == "."))
    assert(childMd.select("contributors_path").as[String].collect()
      .forall(p => p.matches("\\./child-[0-9a-f]{12}/contributors\\.tsv")))

    val events = Reorganize.statusEvents(frozen, "up1")
      .as[(String, String, String)].collect().toSet
    assert(events.count(_._3 == "submitted") == 2)
    assert(events.contains(("up1", "upload", "reorganized")))
  }

  test("movePlan: prefix-sibling dirs (raw1 vs raw10) never cross-match") {
    val frozen = Seq(("c1", "./raw1"), ("c2", "./raw10")).toDF("child_id", "data_path")
    val listing = Seq("raw1/a.bin", "raw10/b.bin").toDF("rel_path")
    val got = Reorganize.movePlan(frozen, listing)
      .select("child_id", "src").as[(String, String)].collect().toSet
    assert(got == Set(("c1", "raw1/a.bin"), ("c2", "raw10/b.bin")))
  }

  test("movePlan routes data files per child and fans global files to all") {
    val frozen = Seq(("c1", "./dataset1"), ("c2", "./dataset2"))
      .toDF("child_id", "data_path")
    val listing = Seq("dataset1/a.bin", "dataset2/b.bin", "global/shared.txt")
      .toDF("rel_path")
    val got = Reorganize.movePlan(frozen, listing)
      .select("child_id", "src", "dst").as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("c1", "dataset1/a.bin", "c1/dataset1/a.bin"),
      ("c2", "dataset2/b.bin", "c2/dataset2/b.bin"),
      ("c1", "global/shared.txt", "c1/shared.txt"),
      ("c2", "global/shared.txt", "c2/shared.txt")))
  }
}
