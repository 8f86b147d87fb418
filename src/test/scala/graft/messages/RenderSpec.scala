package graft.messages

import org.scalatest.funsuite.AnyFunSuite
import graft.messages.Render._

/** Golden-string specs mirroring the reference's tests/fixtures.py
  * (`slack_upload_reorg_priority_str` / `slack_upload_reorg_str`) with
  * injected deployment strings. Every structural detail is pinned:
  * header wording, key order, slack-link syntax, blank line, CSV header
  * row, `, ` cell join, comma→semicolon cleaning, list→`;` join.
  */
class RenderSpec extends AnyFunSuite {

  private val upload = UploadInfo("test_uuid", "test_hm_id", "Test User",
    "test@user.com", Seq("test_priority_project"))
  private val datasets = Seq(
    DatasetRow("test_dataset_hm_id", "test user", "test@user.com",
      "test_dataset_type", Seq("test_priority_project")),
    DatasetRow("test_dataset_hm_id2", "test user2", "test@user2.com",
      "test_dataset_type2", Seq("test_priority_project")))
  private val absPaths = Map(
    "test_dataset_hm_id" -> "test_abs_path", "test_dataset_hm_id2" -> "test_abs_path")

  test("golden: priority upload-reorganized slack message") {
    val got = uploadReorganized(upload, datasets, organ = "test_organ",
      ingestUiUrl = "https://ingest.example.org/upload/test_uuid",
      globusUrl = "test_globus_url", absPaths = absPaths,
      entityIdKey = "hubmap_id", priority = true)
    val expected = Seq(
      "Priority upload (test_priority_project) reorganized:",
      "hubmap_id: <https://ingest.example.org/upload/test_uuid|test_hm_id>",
      "created_by_user_displayname: Test User",
      "created_by_user_email: test@user.com",
      "dataset_type: test_dataset_type",
      "organ: test_organ",
      "priority_project_list: test_priority_project",
      "",
      "Datasets:",
      "hubmap_id,created_by_user_displayname,created_by_user_email,priority_project_list,dataset_type,organ,globus_link,filesystem_path",
      "test_dataset_hm_id, test user, test@user.com, test_priority_project, test_dataset_type, test_organ, <test_globus_url|Globus>, test_abs_path",
      "test_dataset_hm_id2, test user2, test@user2.com, test_priority_project, test_dataset_type2, test_organ, <test_globus_url|Globus>, test_abs_path")
    assert(got == expected)
  }

  test("golden: non-priority upload-reorganized slack message") {
    val got = uploadReorganized(upload, datasets, organ = "test_organ",
      ingestUiUrl = "https://ingest.example.org/upload/test_uuid",
      globusUrl = "test_globus_url", absPaths = absPaths,
      entityIdKey = "hubmap_id")
    val expected = Seq(
      "Upload test_hm_id | test_uuid reorganized:",
      "hubmap_id: <https://ingest.example.org/upload/test_uuid|test_hm_id>",
      "created_by_user_displayname: Test User",
      "created_by_user_email: test@user.com",
      "dataset_type: test_dataset_type",
      "organ: test_organ",
      "",
      "Datasets:",
      "hubmap_id,created_by_user_displayname,created_by_user_email,dataset_type,organ,globus_link,filesystem_path",
      "test_dataset_hm_id, test user, test@user.com, test_dataset_type, test_organ, <test_globus_url|Globus>, test_abs_path",
      "test_dataset_hm_id2, test user2, test@user2.com, test_dataset_type2, test_organ, <test_globus_url|Globus>, test_abs_path")
    assert(got == expected)
  }

  test("commas in cells become semicolons; multi-project lists join with ;") {
    val messy = Seq(DatasetRow("id1", "Last, First", "a@b.c", "type,with,commas",
      Seq("proj1", "proj2")))
    val got = uploadReorganized(upload, messy, organ = "o",
      ingestUiUrl = "u", globusUrl = "g", absPaths = Map.empty, priority = true)
    assert(got.last == "id1, Last; First, a@b.c, proj1;proj2, type;with;commas, o, <g|Globus>, ")
  }

  test("golden: id-list overflow footer at max_rows=20") {
    val ids = (1 to 25).map(i => s"ID-$i")
    val got = idListWithFooter(ids, maxRows = 20)
    assert(got.length == 21)
    assert(got.take(20) == ids.take(20))
    assert(got.last == "...5 more datasets, see CSV attachment")
    assert(idListWithFooter(ids.take(20), maxRows = 20) == ids.take(20))
  }

  test("golden: link, csv naming, bullet and section blocks") {
    assert(createLink("https://ingest.example.org/dataset/u1", "HM-1") ==
      """<a href="https://ingest.example.org/dataset/u1">HM-1</a>""")
    assert(csvName("Group - Sub Lab", "2026-08-12") == "Group_Sub_Lab_2026-08-12.csv")
    val bullets = formatIdBullets("<li>QA: 2</li>", "Ready for review.<br>",
      Seq("HM-1", "HM-2"))
    assert(bullets == Seq("<li>QA: 2</li>", "Ready for review.<br>", "<ul>",
      "<li>HM-1</li>", "<li>HM-2</li>", "</ul>", "<br>"))
    val section = annotatedStatuses("What you can do", "Brief instructions.",
      Seq(bullets))
    assert(section.head == "<br>" && section(1) == "<b>What you can do:</b><br>")
    assert(section.last == "</ul>")
    assert(annotatedStatuses("t", "d", Nil) == Nil)
  }

  test("template header carries the count and injected lines in reference order") {
    val got = templateHeader("Biweekly unpublished dataset report for Group A",
      "This report is sent to the group PIs.", nDatasets = 42,
      extraLines = Seq("Contact line.<br>", "<br>"))
    assert(got == Seq(
      "<b>Biweekly unpublished dataset report for Group A</b><br>",
      "This report is sent to the group PIs.<br>",
      "<br>",
      "Contact line.<br>",
      "<br>",
      "<b>Unpublished datasets:</b> 42<br>",
      "You can see more details about all datasets in the attached CSV file.<br>",
      "<br>"))
  }
}
