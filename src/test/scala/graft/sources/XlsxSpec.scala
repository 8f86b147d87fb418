package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSpec extends SparkSpec {

  private def zip(parts: (String, String)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    parts.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  private val sharedXml =
    """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
      |<si><t>name</t></si><si><t>B&amp;W</t></si></sst>""".stripMargin
  private val sheetXml =
    """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
      |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
      |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="C2"><v>3.5</v></c></row>
      |</sheetData></worksheet>""".stripMargin

  /** Build a minimal real .xlsx (zip of XML parts, no workbook.xml). */
  private def syntheticXlsx(): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "xl/sharedStrings.xml" -> sharedXml,
    "xl/worksheets/sheet1.xml" -> sheetXml,
  )

  /** Two sheets whose workbook order DIFFERS from filename order, with
    * names carried in workbook.xml — the pandas sheet_name=None shape.
    */
  private def multiSheetXlsx(): Array[Byte] = zip(
    "[Content_Types].xml" -> "<Types/>",
    "xl/sharedStrings.xml" -> sharedXml,
    "xl/workbook.xml" ->
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="Summary" sheetId="1" r:id="rId2"/>
        |<sheet name="Objects &amp; Refs" sheetId="2" r:id="rId1"/>
        |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      // attribute order intentionally varies per element: producers
      // are free to emit Target before Id
      """<?xml version="1.0"?><Relationships>
        |<Relationship Target="worksheets/sheet1.xml" Type="..." Id="rId1"/>
        |<Relationship Id="rId2" Type="..." Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/worksheets/sheet1.xml" -> sheetXml,
    "xl/worksheets/sheet2.xml" ->
      """<worksheet><sheetData><row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>""",
  )

  test("parseFirstSheet resolves shared strings, positions, and escapes") {
    val rows = Xlsx.parseFirstSheet(syntheticXlsx())
    assert(rows == Seq(
      Seq("name", "42"),
      Seq("B&W", "", "3.5"))) // C2 leaves B2 empty
  }

  test("parseSheets honors workbook.xml order, names, and rels targets") {
    val sheets = Xlsx.parseSheets(multiSheetXlsx())
    assert(sheets.map(_._1) == Seq("Summary", "Objects & Refs"))
    // "Summary" maps through rId2 -> sheet2.xml, not filename order
    assert(sheets.head._2 == Seq(Seq("7")))
    assert(sheets(1)._2.head == Seq("name", "42"))
  }

  test("read produces positional string columns over a directory, one row per sheet row") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    val f1 = new FileOutputStream(new java.io.File(dir, "objects.xlsx"))
    f1.write(syntheticXlsx()); f1.close()
    val f2 = new FileOutputStream(new java.io.File(dir, "multi.xlsx"))
    f2.write(multiSheetXlsx()); f2.close()
    val df = Xlsx.read(spark, dir.getAbsolutePath)
    assert(df.columns.take(3).toSeq == Seq("path", "sheet", "row_idx"))
    val bySheet = df.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // objects.xlsx has no workbook.xml -> fallback name "sheet1"
    assert(bySheet == Map("sheet1" -> 2, "Summary" -> 1, "Objects & Refs" -> 2))
    val summary = df.filter(org.apache.spark.sql.functions.col("sheet") === "Summary")
      .select("c0").collect().map(_.getString(0)).toSeq
    assert(summary == Seq("7"))
  }
}
