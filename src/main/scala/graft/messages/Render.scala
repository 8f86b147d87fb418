package graft.messages

/** Message-rendering layer (SURVEY §2.2 K5 tail): the reference pins its
  * outbound Slack/email strings with golden fixtures
  * (tests/fixtures.py `slack_upload_reorg*_str`); the producers are
  * status_change/slack/reorganized.py (upload-reorganized messages) and
  * email_providers.py:329-508 (report template, id bullets, overflow
  * footer, CSV naming). This object reproduces those renderings exactly
  * — line lists, key order, separators, comma→semicolon cleaning — with
  * deployment-specific strings (base URLs, entity-id key, contact lines)
  * injected rather than baked in. Selection/counting stays relational
  * (q41 and friends); this is the presentation skin over those results.
  */
object Render {

  /** One child dataset row of an upload (reorganized.py dataset dicts).
    * `priorityProjects` is a list in the reference; rendering joins it
    * with `;` via the clean-rows rule.
    */
  final case class DatasetRow(entityId: String, displayName: String, email: String,
                              datasetType: String, priorityProjects: Seq[String] = Nil)

  /** The upload entity under reorganization (reorganized.py entity_data
    * fields used by the message).
    */
  final case class UploadInfo(uuid: String, entityId: String, displayName: String,
                              email: String, priorityProjects: Seq[String] = Nil)

  /** `_clean_dataset_rows` (reorganized.py:50-61): lists join with `;`,
    * strings swap `,` → `;` so rows stay one-line CSV.
    */
  private def cleanCell(v: Either[Seq[String], String]): String = v match {
    case Left(xs) => xs.mkString(";")
    case Right(s) => s.replace(",", ";")
  }

  /** `SlackUploadReorganized.format` / `...Priority.format`
    * (reorganized.py:63-69,135-151): header line, `key: value` metadata
    * block (entity id rendered as a `<url|id>` slack link), blank line,
    * `Datasets:` block with a CSV header row then one cleaned row per
    * dataset. `entityIdKey` is the deployment's id field name (the
    * reference uses its consortium id key); `ingestUiUrl` and the
    * per-dataset `globusUrl`/`absPath` come from API lookups in the
    * reference, injected here.
    */
  def uploadReorganized(upload: UploadInfo, datasets: Seq[DatasetRow],
                        organ: String, ingestUiUrl: String,
                        globusUrl: String, absPaths: Map[String, String],
                        entityIdKey: String = "entity_id",
                        priority: Boolean = false): Seq[String] = {
    val datasetType = datasets.headOption.map(_.datasetType).getOrElse("")
    val header =
      if (priority) s"Priority upload (${upload.priorityProjects.mkString(", ")}) reorganized:"
      else s"Upload ${upload.entityId} | ${upload.uuid} reorganized:"
    val msgData: Seq[(String, String)] = Seq(
      entityIdKey -> s"<$ingestUiUrl|${upload.entityId}>",
      "created_by_user_displayname" -> upload.displayName,
      "created_by_user_email" -> upload.email,
      "dataset_type" -> datasetType,
      "organ" -> organ) ++
      (if (priority) Seq("priority_project_list" -> upload.priorityProjects.mkString(", "))
       else Nil)
    val valKeys =
      if (priority)
        Seq(entityIdKey, "created_by_user_displayname", "created_by_user_email",
          "priority_project_list", "dataset_type")
      else
        Seq(entityIdKey, "created_by_user_displayname", "created_by_user_email",
          "dataset_type")
    val csvHeader = (valKeys ++ Seq("organ", "globus_link", "filesystem_path")).mkString(",")
    val rows = datasets.map { d =>
      val vals: Seq[Either[Seq[String], String]] =
        (Seq(Right(d.entityId), Right(d.displayName), Right(d.email)) ++
          (if (priority) Seq(Left(d.priorityProjects)) else Nil) ++
          Seq(Right(d.datasetType), Right(organ),
            Right(s"<$globusUrl|Globus>"),
            Right(absPaths.getOrElse(d.entityId, "")))): Seq[Either[Seq[String], String]]
      vals.map(cleanCell).mkString(", ")
    }
    Seq(header) ++ msgData.map { case (k, v) => s"$k: $v" } ++
      Seq("", "Datasets:", csvHeader) ++ rows
  }

  /** Overflow cut (email_providers.py:341-348,485-489): at most
    * `maxRows` ids, then the exact `...N more` footer naming the CSV
    * attachment.
    */
  def idListWithFooter(ids: Seq[String], maxRows: Int = 20): Seq[String] =
    if (ids.length > maxRows)
      ids.take(maxRows) :+ s"...${ids.length - maxRows} more datasets, see CSV attachment"
    else ids

  /** `create_link` (email_providers.py:473-474). */
  def createLink(url: String, id: String): String = s"""<a href="$url">$id</a>"""

  /** CSV attachment naming (email_providers.py:322-326
    * `get_csv_path`): `" - "` then `" "` fold to `_`, date-stamped.
    */
  def csvName(groupName: String, date: String): String =
    s"${groupName.replace(" - ", "_").replace(" ", "_")}_$date.csv"

  /** Report header block (email_providers.py:353-364
    * `get_template_header`): title, audience note, dataset count,
    * CSV pointer — contact/guide lines injected by the deployment.
    */
  def templateHeader(reportTitle: String, audienceNote: String, nDatasets: Long,
                     extraLines: Seq[String] = Nil): Seq[String] =
    Seq(
      s"<b>$reportTitle</b><br>",
      s"$audienceNote<br>",
      "<br>") ++ extraLines ++ Seq(
      s"<b>Unpublished datasets:</b> $nDatasets<br>",
      "You can see more details about all datasets in the attached CSV file.<br>",
      "<br>")

  /** Per-status bullet block (email_providers.py:462-470
    * `format_id_bullets`): count line, status description, `<li>` per
    * id, closing tags.
    */
  def formatIdBullets(countLine: String, statusDescription: String,
                      ids: Seq[String]): Seq[String] =
    Seq(countLine, statusDescription, "<ul>") ++
      ids.map(id => s"<li>$id</li>") ++ Seq("</ul>", "<br>")

  /** Section wrapper (email_providers.py:431-459 `annotated_statuses`):
    * empty when no status has rows, else title/description and the
    * per-status bullet blocks inside one `<ul>`.
    */
  def annotatedStatuses(sectionTitle: String, sectionDesc: String,
                        bullets: Seq[Seq[String]]): Seq[String] =
    if (bullets.isEmpty) Nil
    else Seq("<br>", s"<b>$sectionTitle:</b><br>", s"$sectionDesc<br>", "<ul>") ++
      bullets.flatten ++ Seq("</ul>")
}
